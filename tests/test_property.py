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
    ["sum", "max", "mean", "mincount", "geomean", "relvar"]))
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
