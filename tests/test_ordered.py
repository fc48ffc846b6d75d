"""OOO ordered-state tests — the pytest port of the reference's
out-of-order / bulk / range-query suites (cpp/src/test.cc:442-647,
cpp/src/bulk_test.cc, FIXTURES.md §F4-F6)."""

from collections import Counter

import numpy as np
import pytest

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators import OrderedAggState

RNG = np.random.default_rng(42)


def test_duplicate_ts_multiset():
    """at(ts) equals a multiset count under random duplicate inserts
    (test.cc:442-474)."""
    m = get_monoid("count")
    st = OrderedAggState(m)
    oracle = Counter()
    for _rep in range(5):
        ts = RNG.integers(0, 50, 200)
        st.bulk_insert(ts, m.lift(ts))
        oracle.update(ts.tolist())
        for t in range(50):
            p = st.at(t)
            assert (0 if p is None else int(p["v"][0])) == oracle[t]


def test_random_scatter_collect_order():
    """Scattered unique inserts; Collect is the order witness
    (test.cc:550-615)."""
    m = get_monoid("collect")
    st = OrderedAggState(m)
    seen = {}
    for i in range(300):
        t = int(i + RNG.integers(0, 11 * 50))
        while t in seen:
            t += 1
        seen[t] = float(i)
        st.insert(t, m.lift1(float(i)))
    assert st.query() == [seen[t] for t in sorted(seen)]


def test_random_scatter_bloom_vs_map_walk():
    m = get_monoid("bloom")
    st = OrderedAggState(m)
    vals = {}
    for i in range(200):
        t = int(i + RNG.integers(0, 11 * 50))
        while t in vals:
            t += 1
        vals[t] = i
        st.insert(t, m.lift1(i))
    brute = m.lift_reduce(np.array([vals[t] for t in sorted(vals)]))
    assert np.array_equal(st.query_partial()["bits"], brute["bits"])


def test_bulk_evict_survivors_exclusive_inclusive():
    """bulkEvict(t) leaves exactly (minTime, maxTime]
    (bulk_test.cc:249-294), and follow-up inserts still work."""
    m = get_monoid("collect")
    st = OrderedAggState(m)
    ts = np.sort(RNG.choice(100000, 500, replace=False))
    st.bulk_insert(ts, m.lift(ts.astype(float)))
    cut = int(ts[250])
    st.bulk_evict(cut)
    assert st.query() == [float(t) for t in ts if t > cut]
    st.insert(cut + 1_000_000, m.lift1(-1.0))
    assert st.query() == [float(t) for t in ts if t > cut] + [-1.0]


def test_bulk_insert_fixed_pattern():
    """Fixed bulks with interleavings (bulk_test.cc:39-77 shape)."""
    m = get_monoid("collect")
    st = OrderedAggState(m)
    init = [1, 500, 1000, 1500]
    st.bulk_insert(np.array(init), m.lift(np.array(init, dtype=float)))
    bulk1 = [5, 507, 509, 511, 515, 516, 517, 518, 1700, 1701, 1702, 1703]
    st.bulk_insert(np.array(bulk1), m.lift(np.array(bulk1, dtype=float)))
    expected = sorted(init + bulk1)
    assert st.query() == [float(t) for t in expected]


def test_range_query_all_pairs_inclusive():
    """rangeQuery(t_i, t_j) inclusive of both endpoints equals a brute
    fold for every i ≤ j (test.cc:618-647, window 50+2)."""
    m = get_monoid("sum")
    st = OrderedAggState(m)
    ts = np.cumsum(RNG.integers(1, 4, 52))
    vals = RNG.integers(1, 100, 52).astype(float)
    st.bulk_insert(ts, m.lift(vals))
    for i in range(52):
        for j in range(i, 52):
            assert st.range_query(ts[i], ts[j]) == float(vals[i : j + 1].sum())


def test_range_query_noncommutative():
    m = get_monoid("argmax")
    st = OrderedAggState(m)
    ts = np.cumsum(RNG.integers(1, 4, 52))
    keys = RNG.integers(1, 10, 52).astype(float)
    st.bulk_insert(ts, m.lift((np.arange(52), keys)))
    for i in range(0, 52, 3):
        for j in range(i, 52, 5):
            assert st.range_query(ts[i], ts[j]) == int(i + np.argmax(keys[i : j + 1]))


def test_ooo_displaced_block_steady():
    """Permanent out-of-orderness: displaced prefix block then steady
    evict/insert (cpp/src/benchmark_core.h:185-247)."""
    m = get_monoid("sum")
    st = OrderedAggState(m)
    w, d, iters = 100, 25, 2000
    live = set()
    for t in list(range(iters - d, iters)) + list(range(0, w - d)):
        st.insert(t, m.lift1(1.0))
        live.add(t)
    for step in range(500):
        st.evict_oldest()
        live.remove(min(live))
        t = w - d + step
        st.insert(t, m.lift1(1.0))
        live.add(t)
        assert st.query() == float(len(live))


def test_targeted_evict_and_at():
    """evict(t) + at(t) (FiBA.hpp:1691-1743, 1661; test.cc:476-522)."""
    m = get_monoid("sum")
    st = OrderedAggState(m)
    for t in [10, 20, 30]:
        st.insert(t, m.lift1(float(t)))
    assert st.evict(20)
    assert st.at(20) is None
    assert not st.evict(20)
    assert st.query() == 40.0


def test_serde_roundtrip():
    m = get_monoid("mean")
    st = OrderedAggState(m)
    ts = np.arange(100)
    st.bulk_insert(ts, m.lift(ts.astype(float)))
    st2 = OrderedAggState.loads(st.dumps(), m)
    assert st2.query() == st.query()
    assert st2.range_query(10, 20) == st.range_query(10, 20)


class _CountingSum:
    """Sum wrapper that counts ELEMENTS flowing through combine — the cost
    model for tree maintenance (each combined element = one ⊕)."""

    def __init__(self):
        self._inner = get_monoid("sum", np.int64)
        self.combined = 0

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def combine(self, a, b):
        self.combined += len(next(iter(a.values())))
        return self._inner.combine(a, b)


def test_incremental_repair_cost_sublinear_in_state_size():
    """FiBA's algorithmic point (cpp/src/FiBA.hpp:930-992): per-mutation
    aggregate repair touches O(log n) spine nodes, not the whole tree.
    Verify the per-batch ⊕-count for a small displaced batch stays flat
    while the state size grows 16× (a rebuild would grow it 16×), and that
    outputs equal a from-scratch state's."""
    rng = np.random.default_rng(7)
    costs = {}
    for n in (1 << 12, 1 << 16):
        m = _CountingSum()
        st = OrderedAggState(m)
        st.bulk_insert(np.arange(n, dtype=np.int64) * 10, m.lift(np.ones(n, np.int64)))
        st.query_partial()
        m.combined = 0
        # 8 OOO batches of 16, landing ~64 entries behind the tip
        for i in range(8):
            base = (n - 64 + i) * 10 + 1
            ts = base + np.arange(16, dtype=np.int64) * 3
            st.bulk_insert(ts, m.lift(np.full(16, 2, np.int64)))
        costs[n] = m.combined
        # equal outputs: compare against a fresh state built in one shot
        fresh = OrderedAggState(get_monoid("sum", np.int64))
        fresh.bulk_insert(np.array(st.ts), {"v": np.array(st.partials["v"])})
        assert st.query() == fresh.query()
        lo, hi = int(st.ts[5]), int(st.ts[-3])
        assert st.range_query(lo, hi) == fresh.range_query(lo, hi)
    # 16× the state, ~flat repair cost (allow 3× slack for the extra
    # log-levels); an O(n) rebuild would scale the cost ~16×
    assert costs[1 << 16] < 3 * costs[1 << 12], costs


def test_bulk_evict_is_offset_only_zero_combines():
    m = _CountingSum()
    st = OrderedAggState(m)
    n = 1 << 14
    st.bulk_insert(np.arange(n, dtype=np.int64), m.lift(np.ones(n, np.int64)))
    m.combined = 0
    st.bulk_evict(n // 2)
    assert m.combined == 0
    assert st.size() == n - n // 2 - 1
    assert st.query() == st.size()


def test_at_and_query_partial_return_detached_snapshots():
    """at()/query_partial() hand out copies: later mutations must not leak
    into held snapshots, and caller mutations must not poison the cache."""
    m = get_monoid("sum")
    st = OrderedAggState(m)
    st.bulk_insert(np.array([1, 2, 3]), m.lift(np.array([10.0, 20.0, 30.0])))
    snap = st.at(2)
    st.insert(2, m.lift1(5.0))  # combine-in-place at existing ts
    assert float(snap["v"][0]) == 20.0  # snapshot unchanged
    assert float(st.at(2)["v"][0]) == 25.0
    qp = st.query_partial()
    qp["v"][0] = 999.0  # caller scribbles on the result
    assert st.query() == 65.0  # cache unpoisoned (10+25+30)


def test_loads_rejects_monoid_mismatch():
    m = get_monoid("sum")
    st = OrderedAggState(m)
    st.bulk_insert(np.array([1, 2]), m.lift(np.array([1.0, 2.0])))
    blob = st.dumps()
    with pytest.raises(ValueError, match="mismatch"):
        OrderedAggState.loads(blob, get_monoid("mean"))
    with pytest.raises(ValueError, match="dtype mismatch"):
        OrderedAggState.loads(blob, get_monoid("sum", np.int64))
    # matching monoid still round-trips
    st2 = OrderedAggState.loads(blob, get_monoid("sum"))
    assert st2.query() == 3.0


def test_flush_after_huge_evict_is_cheap():
    """The dirty span is clamped to the live window: after evicting almost
    everything, the first fold must repair only the survivors' ancestors
    (counted via a combine-counting monoid wrapper)."""
    m = get_monoid("sum")

    class CountingSum(type(m)):
        calls = 0

        def combine(self, a, b):
            CountingSum.calls += max(
                len(next(iter(a.values()))) if a else 1, 1
            )
            return super().combine(a, b)

    cm = CountingSum()
    st = OrderedAggState(cm)
    n = 16384
    ts = np.arange(n, dtype=np.int64)
    st.bulk_insert(ts, cm.lift(np.ones(n)))
    st.bulk_evict(int(ts[-11]))  # keep the last 10
    CountingSum.calls = 0
    assert st.query() == 10.0
    assert CountingSum.calls < 200, CountingSum.calls  # not O(evicted)


def test_deep_duplicate_groups_vectorized_collapse_preserves_order():
    """The vectorized duplicate collapse (one combine per group DEPTH)
    must left-fold each duplicate-timestamp group in (existing, then
    batch) order — pinned with the non-commutative Collect monoid on a
    batch whose internal repeats overlap live timestamps (depth-3 group)."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import OrderedAggState

    m = get_monoid("collect")
    st = OrderedAggState(m)
    st.bulk_insert(np.array([1, 2, 3]), m.lift(np.array([10, 20, 30])))
    st.bulk_insert(
        np.array([2, 2, 2, 3, 4]), m.lift(np.array([21, 22, 23, 31, 40]))
    )
    assert st.ts.tolist() == [1, 2, 3, 4]
    assert st.query() == [10, 20, 21, 22, 23, 30, 31, 40]

    s = get_monoid("sum")
    st2 = OrderedAggState(s)
    st2.bulk_insert(np.array([1, 2, 3]), s.lift(np.array([10, 20, 30])))
    st2.bulk_insert(
        np.array([2, 2, 2, 3, 4]), s.lift(np.array([21, 22, 23, 31, 40]))
    )
    assert st2.query() == 197


def test_random_scatter_maxgap_ooo_stall_detection():
    """The stall monoid under OUT-OF-ORDER arrival: maxgap lifts the
    event time itself, so after scattered inserts the ordered state's
    event-time fold reports the true max adjacent gap — the property
    that makes OOO stall detection correct (a late row can SPLIT a
    detected stall). Eviction re-exposes the next-largest gap."""
    m = get_monoid("maxgap")
    st = OrderedAggState(m)
    ts = set()
    for i in range(300):
        t = int(RNG.integers(0, 10_000))
        while t in ts:
            t += 1
        ts.add(t)
        st.insert(t, m.lift1(t))
    order = sorted(ts)
    brute = max(b - a for a, b in zip(order, order[1:]))
    assert int(st.query()) == brute
    # a late in-the-middle arrival splits the widest stall
    a, b = max(zip(order, order[1:]), key=lambda p: p[1] - p[0])
    mid = (a + b) // 2
    assert mid not in ts
    st.insert(mid, m.lift1(mid))
    ts.add(mid)
    order = sorted(ts)
    assert int(st.query()) == max(y - x for x, y in zip(order, order[1:]))
    # evicting the oldest half re-exposes gaps among survivors only
    cutoff = order[len(order) // 2]
    st.bulk_evict(cutoff - 1)  # survivors: t >= cutoff
    surv = [t for t in order if t >= cutoff]
    assert int(st.query()) == max(y - x for x, y in zip(surv, surv[1:]))


def test_random_scatter_maxrun_ooo_streak():
    """The streak monoid under OOO arrival: bits delivered out of order
    still fold in event-time order, so the longest consecutive run is
    computed over the TRUE timeline."""
    m = get_monoid("maxrun")
    st = OrderedAggState(m)
    bits = {}
    for i in range(400):
        t = int(RNG.integers(0, 5_000))
        while t in bits:
            t += 1
        bits[t] = int(RNG.integers(0, 2))
        st.insert(t, m.lift1(bits[t]))
    seq = [bits[t] for t in sorted(bits)]
    best = cur = 0
    for b in seq:
        cur = cur + 1 if b else 0
        best = max(best, cur)
    assert int(st.query()) == best
