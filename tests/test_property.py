"""Property-based tests (hypothesis) — the pytest analogue of the Rust
property/matrix suite (rust/tests/fifo_window.rs: every algorithm ×
sum/max/mean over random streams vs ReCalc)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators import (
    OrderedAggState,
    SlidingCountWindow,
    sliding_reduce,
)

streams = st.lists(
    st.integers(min_value=1, max_value=1000), min_size=1, max_size=300
)


@settings(max_examples=40, deadline=None)
@given(values=streams, w=st.integers(1, 64), mname=st.sampled_from(
    ["sum", "max", "mean", "mincount", "geomean", "relvar", "hll", "histq", "cms"]))
def test_sliding_reduce_equals_brute(values, w, mname):
    m = get_monoid(mname)
    vals = np.asarray(values, dtype=float)
    got = sliding_reduce(m, vals, w)
    exp = [
        m.lower1(m.lift_reduce(vals[max(0, i - w + 1) : i + 1]))
        for i in range(len(vals))
    ]
    assert np.allclose(got, exp, rtol=1e-9, equal_nan=True)


@settings(max_examples=25, deadline=None)
@given(
    values=streams,
    w=st.integers(1, 64),
    cuts=st.lists(st.integers(0, 299), min_size=1, max_size=5),
)
def test_batched_kernel_equals_one_shot(values, w, cuts):
    """Any batching of the stream must give the same outputs (bulk ops are
    a pure refactoring of per-element ops)."""
    m = get_monoid("mincount")
    vals = np.asarray(values, dtype=float)
    exp = sliding_reduce(m, vals, w).tolist()
    k = SlidingCountWindow(m, w)
    got = []
    idx = sorted({min(c, len(vals)) for c in cuts} | {len(vals)})
    prev = 0
    for c in idx:
        got.extend(k.process(vals[prev:c]).tolist())
        prev = c
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    entries=st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 50)),
        min_size=1,
        max_size=120,
    ),
    cut=st.integers(0, 100),
)
def test_ordered_state_random_inserts_and_evict(entries, cut):
    """Random (possibly duplicate, out-of-order) timestamped inserts then a
    prefix evict: query equals the brute sum of surviving values
    (test.cc:442-615 shape, randomized)."""
    m = get_monoid("sum")
    st_ = OrderedAggState(m)
    ts = np.array([t for t, _ in entries])
    vs = np.array([v for _, v in entries], dtype=float)
    st_.bulk_insert(ts, m.lift(vs))
    st_.bulk_evict(cut)
    assert st_.query() == float(vs[ts > cut].sum())
    # inclusive range query against brute on a random surviving interval
    if (ts > cut).any():
        lo, hi = int(ts[ts > cut].min()), int(ts.max())
        assert st_.range_query(lo, hi) == float(vs[(ts >= lo) & (ts <= hi) & (ts > cut)].sum())


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 500), st.integers(1, 100)),
        min_size=1,
        max_size=200,
    ),
    dur=st.integers(1, 300),
    cut=st.integers(0, 199),
)
def test_time_segmented_kernel_property(data, dur, cut):
    """TimeSegmentedKernel over random multi-key time series, split at a
    random point, equals the per-key sliding_time_window reference."""
    from sliding_window_aggregators_spark.operators.kernels import (
        TimeSegmentedKernel,
        sliding_time_window,
    )

    m = get_monoid("sum", np.int64)
    data = sorted(data, key=lambda kv: (kv[0],))
    keys = np.array([k for k, _, _ in data], dtype=np.int64)
    # strictly increasing ts within key: cumulative deltas
    ts = np.empty(len(data), dtype=np.int64)
    vals = np.array([v for _, _, v in data], dtype=np.int64)
    acc = {}
    for i, (k, dt, _v) in enumerate(data):
        acc[k] = acc.get(k, 0) + dt
        ts[i] = acc[k]
    kern = TimeSegmentedKernel(m, {"d": dur})
    cut = min(cut, len(data))
    parts = []
    for lo, hi in ((0, cut), (cut, len(data))):
        if hi > lo:
            parts.append(
                m.lower(kern.process(keys[lo:hi], ts[lo:hi], m.lift(vals[lo:hi]))["d"])
            )
    got = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    exp_parts = []
    for k in sorted(set(keys.tolist())):
        sel = keys == k
        exp_parts.append(
            m.lower(sliding_time_window(m, ts[sel], m.lift(vals[sel]), dur))
        )
    exp = np.concatenate(exp_parts)
    assert np.array_equal(got, exp)


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=200,
    ),
    period=st.integers(1, 40),
    cut=st.integers(0, 199),
)
def test_positional_segmented_kernel_property(data, period, cut):
    """PositionalSegmentedKernel (sawtooth) over random multi-key input,
    random split, equals the brute fold."""
    from sliding_window_aggregators_spark.operators.kernels import (
        PositionalSegmentedKernel,
    )

    m = get_monoid("sum", np.int64)
    data = sorted(data, key=lambda kv: (kv[0],))
    keys = np.array([k for k, _ in data], dtype=np.int64)
    vals = np.array([v for _, v in data], dtype=np.int64)
    kern = PositionalSegmentedKernel(m, lambda rn: rn - (rn % period), period - 1)
    cut = min(cut, len(data))
    parts = []
    for lo, hi in ((0, cut), (cut, len(data))):
        if hi > lo:
            parts.append(m.lower(kern.process(keys[lo:hi], m.lift(vals[lo:hi]))))
    got = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    exp = []
    for k in sorted(set(keys.tolist())):
        v = vals[keys == k]
        for i in range(len(v)):
            exp.append(int(v[i - (i % period) : i + 1].sum()))
    assert np.array_equal(got, np.array(exp, dtype=np.int64))


# ---------------------------------------------------------------------------
# Round-5 additions: the integer-domain monoid families + universal laws
# ---------------------------------------------------------------------------

_INT_MONOIDS = ["bloom", "dfa", "dfa_funnel", "top3", "minhash", "adjsum",
                "trend", "toolset", "maxrun", "maxgap"]


@settings(max_examples=40, deadline=None)
@given(values=streams, w=st.integers(1, 64), mname=st.sampled_from(_INT_MONOIDS))
def test_sliding_reduce_equals_brute_int_monoids(values, w, mname):
    """The integer-domain twin of test_sliding_reduce_equals_brute: the
    CEP/order-statistic/segment families are exact int64, so the
    comparison is equality, not allclose."""
    m = get_monoid(mname)
    vals = np.asarray(values, dtype=np.int64)
    got = sliding_reduce(m, vals, w)
    exp = [
        m.lower1(m.lift_reduce(vals[max(0, i - w + 1): i + 1]))
        for i in range(len(vals))
    ]
    assert np.asarray(got).tolist() == [int(e) for e in exp]


_LAW_MONOIDS = ["sum", "count", "max", "min", "mean", "geomean", "stddev",
                "mincount", "relvar", "bloom", "hll", "histq", "cms",
                "collect", "dfa", "dfa_funnel", "decayed", "top3", "minhash",
                "adjsum", "trend", "toolset", "maxrun", "maxgap"]


def _lift_for(m, name, vals):
    if name == "argmax":
        return m.lift((np.arange(len(vals)), vals))
    return m.lift(vals)


@settings(max_examples=60, deadline=None)
@given(
    values=st.lists(st.integers(min_value=1, max_value=1000),
                    min_size=2, max_size=120),
    cut=st.integers(1, 119),
    mname=st.sampled_from(_LAW_MONOIDS + ["argmax"]),
)
def test_split_combine_law_all_monoids(values, cut, mname):
    """THE monoid contract, fuzzed over the whole registry: reducing any
    prefix/suffix split and combining equals reducing the whole — the
    property every kernel, scan, fold, and state tree in the engine
    relies on (cpp/src/AggregationFunctions.hpp's associativity
    requirement)."""
    m = get_monoid(mname)
    vals = np.asarray(values, dtype=np.int64)
    k = min(cut, len(vals) - 1)
    whole = m.reduce(_lift_for(m, mname, vals))
    split = m.combine(
        m.reduce(_lift_for(m, mname, vals[:k]) if mname != "argmax"
                 else m.lift((np.arange(k), vals[:k]))),
        m.reduce(_lift_for(m, mname, vals[k:]) if mname != "argmax"
                 else m.lift((np.arange(k, len(vals)), vals[k:]))),
    )
    for key in whole:
        a, b = np.asarray(whole[key]), np.asarray(split[key])
        if a.dtype.kind == "f":
            assert np.allclose(a, b, rtol=1e-9, equal_nan=True), (mname, key)
        else:
            assert (a == b).all(), (mname, key)


@settings(max_examples=60, deadline=None)
@given(
    values=st.lists(st.integers(min_value=1, max_value=1000),
                    min_size=1, max_size=120),
    mname=st.sampled_from(_LAW_MONOIDS),
)
def test_identity_law_all_monoids(values, mname):
    """e ⊕ x = x ⊕ e = x for every registry monoid on its partial domain."""
    m = get_monoid(mname)
    x = m.reduce(m.lift(np.asarray(values, dtype=np.int64)))
    e = m.identity(1)
    for l, r in ((m.combine(e, x), x), (m.combine(x, e), x)):
        for key in r:
            a, b = np.asarray(l[key]), np.asarray(r[key])
            if a.dtype.kind == "f":
                assert np.allclose(a, b, rtol=1e-12, equal_nan=True), (mname, key)
            else:
                assert (a == b).all(), (mname, key)
