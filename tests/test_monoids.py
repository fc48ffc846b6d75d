"""Monoid algebra tests: vectorized scans vs element-at-a-time folds,
plus reference-parity semantics (float32 geomean lower, argmax `>=`
tie-break, Bloom salted hashing — cpp/src/AggregationFunctions.hpp)."""

import numpy as np
import pytest

from sliding_window_aggregators_spark.functions import (
    get_monoid,
    p_concat,
    p_take,
    registry,
)

RNG = np.random.default_rng(42)
VALS = RNG.integers(1, 20, 64).astype(float)


def brute_prefix(m, p, n):
    outs, acc = [], None
    for i in range(n):
        pi = p_take(p, slice(i, i + 1))
        acc = pi if acc is None else m.combine(acc, pi)
        outs.append(acc)
    return p_concat(*outs)


def brute_suffix(m, p, n):
    outs, acc = [], None
    for i in reversed(range(n)):
        pi = p_take(p, slice(i, i + 1))
        acc = pi if acc is None else m.combine(pi, acc)
        outs.append(acc)
    return p_concat(*outs[::-1])


def lifted(name, m, vals=VALS):
    if name == "argmax":
        return m.lift((np.arange(len(vals)), vals))
    if name in ("bloom", "hll", "histq", "cms", "dfa", "dfa_funnel", "minhash", "adjsum", "trend", "toolset", "maxrun", "maxgap"):
        return m.lift(vals.astype(int))
    return m.lift(vals)


@pytest.mark.parametrize("name", [n for n in registry() if n != "busyloop"])
def test_scans_match_brute_fold(name):
    m = get_monoid(name)
    p = lifted(name, m)
    n = len(VALS)
    for got, exp in [
        (m.accumulate(p), brute_prefix(m, p, n)),
        (m.raccumulate(p), brute_suffix(m, p, n)),
    ]:
        for k in got:
            assert got[k].tolist() == exp[k].tolist(), (name, k)


@pytest.mark.parametrize(
    "name", ["sum", "max", "mean", "mincount", "relvar", "stddev", "geomean", "argmax"]
)
def test_2d_accumulate_matches_rowwise(name):
    m = get_monoid(name)
    p = lifted(name, m)
    p2 = {k: v.reshape(8, 8) for k, v in p.items()}
    a2 = m.accumulate(p2, axis=1)
    r2 = m.raccumulate(p2, axis=1)
    for row in range(8):
        p1 = {k: v.reshape(8, 8)[row] for k, v in p.items()}
        for k, v in m.accumulate(p1).items():
            assert np.array_equal(a2[k][row], v)
        for k, v in m.raccumulate(p1).items():
            assert np.array_equal(r2[k][row], v)


def test_identity_is_neutral():
    for name, m in registry().items():
        if name == "busyloop":
            continue
        p = lifted(name, m)
        one = p_take(p, slice(0, 1))
        left = m.combine(m.identity(1), one)
        right = m.combine(one, m.identity(1))
        for k in one:
            assert left[k].tolist() == one[k].tolist(), (name, "left", k)
            assert right[k].tolist() == one[k].tolist(), (name, "right", k)


def test_geomean_lower_is_float32():
    """lower must replicate expf((float)(Σlog/(float)n))
    (cpp/src/AggregationFunctions.hpp:173-175)."""
    m = get_monoid("geomean")
    p = m.lift_reduce(np.array([3.0, 7.0, 11.0]))
    logsum = float(np.log(3.0) + np.log(7.0) + np.log(11.0))
    t = np.float32(logsum / np.float32(3))
    expected = float(np.exp(t).astype(np.float32))
    assert m.lower1(p) == expected


def test_argmax_tie_earlier_wins():
    m = get_monoid("argmax")
    p = m.lift((np.array([10, 20, 30]), np.array([5.0, 5.0, 4.0])))
    assert m.lower1(m.reduce(p)) == 10  # `a.max >= b.max → a` (hpp:297)


def test_mincount_identity_sentinel():
    m = get_monoid("mincount")
    p = m.lift(np.array([4.0, 4.0, 9.0]))
    r = m.combine(m.identity(1), m.reduce(p))
    assert m.lower1(r) == 2


def test_bloom_mix_matches_scalar_reference_semantics():
    """The vectorized uint64 mixer must equal a big-int reimplementation of
    the C++ size_t arithmetic (cpp/src/AggregationFunctions.hpp:361-366)."""
    from sliding_window_aggregators_spark.functions.monoids import (
        _BLOOM_SALTS,
        _bloom_mix,
    )

    M = (1 << 64) - 1

    def mix_py(a, b):
        i1 = b >> 32
        i2 = b & ((1 << 32) - 1)
        return (
            a ^ ((a << 7) & M) ^ ((i1 * (a >> 3)) & M)
            ^ ((~(((a << 11) & M) + (i2 ^ (a >> 5))) ) & M)
        ) & M

    vals = [0, 1, 101, 123456789, 2**40 + 17]
    for v in vals:
        hv_vec = int(_bloom_mix(np.array([101], dtype=np.uint64), np.array([v], dtype=np.uint64))[0])
        assert hv_vec == mix_py(101, v)
        for salt in _BLOOM_SALTS.tolist():
            h2_vec = int(_bloom_mix(np.array([hv_vec], dtype=np.uint64), np.uint64(salt))[0])
            assert h2_vec == mix_py(hv_vec, salt)


def test_bloom_salts_are_glibc_srand_1001():
    """Pinned salts = glibc rand() after srand(1001) (hpp:367) — recompute
    via the documented glibc TYPE_3 additive generator."""
    from sliding_window_aggregators_spark.functions.monoids import _BLOOM_SALTS

    r = [1001]
    for i in range(1, 31):
        r.append((16807 * r[i - 1]) % 2147483647)
    for i in range(31, 34):
        r.append(r[i - 31])
    for i in range(34, 344 + 4):
        r.append((r[i - 31] + r[i - 3]) % (1 << 32))
    outs = [x >> 1 for x in r[344:]]
    assert outs[:4] == _BLOOM_SALTS.tolist()


def test_collect_order_and_inverse():
    m = get_monoid("collect")
    p = m.lift(np.array([1.0, 2.0, 3.0]))
    acc = m.reduce(p)
    assert m.lower1(acc) == [1.0, 2.0, 3.0]
    inv = m.inverse_combine(acc, m.lift(np.array([1.0])))
    assert m.lower1(inv) == [2.0, 3.0]


def test_geomean_zero_does_not_poison_auto_strategy():
    """A zero in the stream lifts to logsum = −inf; the auto strategy must
    avoid SubtractOnEvict (whose (−inf) − (−inf) eviction = NaN poisons
    the running total forever) and recover once the zero leaves."""
    from sliding_window_aggregators_spark.operators import SlidingCountWindow

    m = get_monoid("geomean")
    assert m.soe_safe is False
    k = SlidingCountWindow(m, 2)
    out = k.process(np.array([4.0, 0.0, 9.0, 16.0, 25.0]))
    assert not np.isnan(out[-2:]).any()
    assert out[-1] == np.float64(np.float32(np.exp(np.float32((np.log(16.0) + np.log(25.0)) / np.float32(2)))))


def test_relvar_int_identity_lower_is_nan():
    """Empty-window lower must be NaN for the INTEGER dtype too — the
    sentinel subtraction (INT64_MIN − INT64_MAX) would wrap to +1 and
    return a tiny bogus ratio."""
    rv = get_monoid("relvar", np.int64)
    assert np.isnan(rv.lower(rv.identity(3))).all()
    rvf = get_monoid("relvar")
    assert np.isnan(rvf.lower(rvf.identity(1))).all()
