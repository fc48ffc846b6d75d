"""MaxRun / MaxGap — the round-5 segment-concatenation monoids.

Semantic pins beyond the generic lockstep/kernel matrices (which already
drive both through every stepwise algorithm, both kernel strategies, the
log-doubling fold and the disjoint sparse table): planted streaks/gaps,
brute per-frame recomputes over every window width, associativity fuzz,
and the parity-totalization contract (0/1 predicate columns are fixed
points of the lift).
"""

import numpy as np
import pytest

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators import SlidingCountWindow

RNG = np.random.default_rng(1234)


def brute_maxrun(bits):
    best = cur = 0
    for b in bits:
        cur = cur + 1 if b else 0
        best = max(best, cur)
    return best


def brute_maxgap(ts):
    return max((int(ts[i] - ts[i - 1]) for i in range(1, len(ts))), default=0)


def test_maxrun_planted_streak():
    m = get_monoid("maxrun")
    # a 7-streak planted mid-stream; bits elsewhere alternate
    bits = np.array([1, 0] * 10 + [1] * 7 + [0, 1] * 10, dtype=np.int64)
    assert m.lower(m.lift_reduce(bits))[0] == 7
    # window smaller than the streak clips it to the window
    k = SlidingCountWindow(m, 4)
    out = k.process(bits)
    assert out.max() == 4
    # exact per-position check vs brute frames
    exp = [brute_maxrun(bits[max(0, i - 3): i + 1]) for i in range(len(bits))]
    assert out.tolist() == exp


@pytest.mark.parametrize("w", [1, 2, 3, 5, 13, 64])
def test_maxrun_sliding_matches_brute(w):
    m = get_monoid("maxrun")
    vals = RNG.integers(0, 6, 300)  # parity-lifted arbitrary ints
    k = SlidingCountWindow(m, w)
    got = k.process(vals)
    bits = vals % 2
    exp = [brute_maxrun(bits[max(0, i - w + 1): i + 1]) for i in range(len(vals))]
    assert got.tolist() == exp


def test_maxrun_parity_totalization_is_fixed_point_on_bits():
    m = get_monoid("maxrun")
    bits = RNG.integers(0, 2, 100)
    a = m.lift(bits)
    # the contract: a 0/1 column passes through the parity map unchanged
    assert (a["b"] == bits).all() and (a["n"] == 1).all()
    # and arbitrary ints totalize as parity, negatives included
    # (numpy % follows the divisor's sign: (-3) % 2 == 1)
    vals = np.array([2, 3, -3, -4, 1001, 0], dtype=np.int64)
    assert m.lift(vals)["b"].tolist() == [0, 1, 1, 0, 1, 0]


def test_maxgap_planted_stall():
    m = get_monoid("maxgap")
    ts = np.array([0, 10, 20, 30, 3000, 3010, 3020], dtype=np.int64)
    assert m.lower(m.lift_reduce(ts))[0] == 2970
    # window that excludes the stall seam reports only local gaps
    k = SlidingCountWindow(m, 3)
    out = k.process(ts)
    exp = [brute_maxgap(ts[max(0, i - 2): i + 1]) for i in range(len(ts))]
    assert out.tolist() == exp
    assert out[-1] == 10  # the stall left the 3-row window


@pytest.mark.parametrize("w", [1, 2, 3, 5, 13, 64])
def test_maxgap_sliding_matches_brute(w):
    m = get_monoid("maxgap")
    ts = np.cumsum(RNG.integers(1, 50, 300)).astype(np.int64)
    k = SlidingCountWindow(m, w)
    got = k.process(ts)
    exp = [brute_maxgap(ts[max(0, i - w + 1): i + 1]) for i in range(len(ts))]
    assert got.tolist() == exp


def test_maxgap_singleton_and_empty_lower_to_zero():
    m = get_monoid("maxgap")
    assert m.lower(m.identity(3)).tolist() == [0, 0, 0]
    assert m.lower(m.lift(np.array([42]))).tolist() == [0]


@pytest.mark.parametrize("name", ["maxrun", "maxgap"])
def test_associativity_fuzz(name):
    m = get_monoid(name)
    for _ in range(300):
        ra, rb, rc = (
            m.reduce(m.lift(RNG.integers(0, 50, RNG.integers(1, 6))))
            for _ in range(3)
        )
        l = m.combine(m.combine(ra, rb), rc)
        r = m.combine(ra, m.combine(rb, rc))
        for k in l:
            assert (l[k] == r[k]).all(), (name, k)


@pytest.mark.parametrize("name", ["maxrun", "maxgap"])
def test_closed_form_scans_equal_doubling(name):
    """The element-partial closed-form scans (ufunc accumulates; maxgap
    ×12, maxrun ×1.7 over the doubling path on the 2-D block shape) must
    equal the generic doubling scans on 1-D, on the block kernel's 2-D
    axis=1 shape, and fall back for combined (n>1) partials."""
    from sliding_window_aggregators_spark.functions.monoids import (
        _DoublingScanMixin,
        p_take,
    )

    m = get_monoid(name)
    gen = (lambda n: RNG.integers(0, 6, n)) if name == "maxrun" else (
        lambda n: np.cumsum(RNG.integers(-3, 50, n)))
    for n in (1, 2, 3, 7, 33, 200):
        p = m.lift(gen(n).astype(np.int64))
        for fast, suffix in ((m.accumulate(p), False), (m.raccumulate(p), True)):
            slow = _DoublingScanMixin._scan(m, p, 0, suffix)
            for k in fast:
                assert (np.asarray(fast[k]) == np.asarray(slow[k])).all(), (n, suffix, k)
        if n >= 4:
            p2 = m.lift(gen(4 * (n // 4)).astype(np.int64).reshape(4, -1))
            for fast, suffix in ((m.accumulate(p2, axis=1), False),
                                 (m.raccumulate(p2, axis=1), True)):
                slow = _DoublingScanMixin._scan(m, p2, 1, suffix)
                for k in fast:
                    assert (np.asarray(fast[k]) == np.asarray(slow[k])).all()
        comb = m.combine(p_take(p, slice(0, max(1, n - 1))),
                         p_take(p, slice(1, None)))
        fast = m.accumulate(comb)
        slow = _DoublingScanMixin._scan(m, comb, 0, False)
        for k in fast:
            assert (np.asarray(fast[k]) == np.asarray(slow[k])).all()
