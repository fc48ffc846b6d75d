"""SegmentedSlidingKernel: multi-key single-pass sliding windows with
cross-batch carry, against a per-row brute oracle."""

import numpy as np
import pytest

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators import SegmentedSlidingKernel

RNG = np.random.default_rng(42)
N = 4000
KEYS = np.sort(RNG.integers(0, 40, N))
CHUNK = (np.arange(N) // 700).astype(np.int64)
VALS = RNG.integers(1, 50, N).astype(float)
BATCHES = [13, 1, 700, 2200, 0, N]


def brute(m, w, seg_ids):
    out = []
    for i in range(N):
        s = i
        while s > 0 and seg_ids[s - 1] == seg_ids[i] and i - s < w - 1:
            s -= 1
        seg = VALS[s : i + 1]
        if m.name == "argmax":
            out.append(int(np.arange(s, i + 1)[np.argmax(seg)]))
        else:
            out.append(m.lower1(m.lift_reduce(seg)))
    return out


@pytest.mark.parametrize(
    "name", ["sum", "mean", "max", "relvar", "argmax", "mincount", "bloom", "geomean"]
)
@pytest.mark.parametrize("w", [1, 7, 100, 1000])
def test_segmented_multikey_vs_brute(name, w):
    m = get_monoid(name)
    data = VALS.astype(int) if name == "bloom" else VALS
    seg_ids = KEYS * 1000 + CHUNK
    exp = brute(m, w, seg_ids)
    k = SegmentedSlidingKernel(m, w)
    got, i = [], 0
    for sz in BATCHES:
        j = min(N, i + sz)
        p = (
            m.lift((np.arange(i, j), data[i:j]))
            if name == "argmax"
            else m.lift(data[i:j])
        )
        got.extend(m.lower(k.process((KEYS[i:j], CHUNK[i:j]), p)).tolist())
        i = j
    if name == "argmax":
        assert got == exp
    else:
        assert np.allclose(got, exp, rtol=1e-9, equal_nan=True)


def test_segmented_single_key_array_api():
    m = get_monoid("sum")
    k = SegmentedSlidingKernel(m, 5)
    out = m.lower(k.process(np.array([1, 1, 2]), m.lift(np.array([1.0, 2.0, 3.0]))))
    assert out.tolist() == [1.0, 3.0, 3.0]


def test_segmented_empty_batch():
    m = get_monoid("sum")
    k = SegmentedSlidingKernel(m, 5)
    from sliding_window_aggregators_spark.functions import p_len

    assert p_len(k.process(np.array([], dtype=np.int64), m.lift(np.array([])))) == 0


@pytest.mark.parametrize("name", ["sum", "max", "mincount"])
@pytest.mark.parametrize("ndur", [1, 3])
def test_time_segmented_vs_per_key_reference(name, ndur):
    """TimeSegmentedKernel over concatenated key segments, split into
    arbitrary Arrow-batch-like chunks, must equal the per-key
    sliding_time_window reference for every duration (window sharing),
    including across chunk boundaries (bounded time-carry)."""
    from sliding_window_aggregators_spark.operators.kernels import (
        TimeSegmentedKernel,
        sliding_time_window,
    )

    rng = np.random.default_rng(42)
    m = get_monoid(name, np.int64)
    durations = {"d_small": 7, "d_mid": 40, "d_big": 200}
    durations = dict(list(durations.items())[:ndur])
    # 6 keys, contiguous, time-sorted within key, duplicate-free ts
    keys, ts, vals = [], [], []
    for k in range(6):
        n = int(rng.integers(1, 120))
        t = np.cumsum(rng.integers(1, 9, size=n))
        keys.append(np.full(n, f"k{k}", dtype=object))
        ts.append(t.astype(np.int64))
        vals.append(rng.integers(1, 50, size=n).astype(np.int64))
    key_arr = np.concatenate(keys)
    ts_arr = np.concatenate(ts)
    val_arr = np.concatenate(vals)

    kernel = TimeSegmentedKernel(m, durations)
    cuts = sorted(rng.choice(np.arange(1, len(key_arr)), size=5, replace=False))
    got = {c: [] for c in durations}
    for lo, hi in zip([0] + list(cuts), list(cuts) + [len(key_arr)]):
        out = kernel.process(
            key_arr[lo:hi], ts_arr[lo:hi], m.lift(val_arr[lo:hi])
        )
        for c in durations:
            got[c].append(m.lower(out[c]))
    got = {c: np.concatenate(v) for c, v in got.items()}

    for c, dur in durations.items():
        exp_parts = []
        for k, t, v in zip(keys, ts, vals):
            exp_parts.append(m.lower(sliding_time_window(m, t, m.lift(v), dur)))
        exp = np.concatenate(exp_parts)
        assert np.array_equal(got[c], exp), (name, c)


def test_time_segmented_overflow_fallback_path():
    """Force the per-segment fallback (island offset would overflow) and
    check it agrees with the vectorized path's semantics."""
    from sliding_window_aggregators_spark.operators.kernels import (
        TimeSegmentedKernel,
        sliding_time_window,
    )

    m = get_monoid("sum", np.int64)
    # gigantic per-segment span × several segments so seg_idx·K overflows
    # the int64 guard → the per-segment loop must run
    keys = np.array(["a", "a", "b", "b", "c", "c"], dtype=object)
    ts = np.array([0, 2**61, 7, 2**61 + 5, 3, 2**61 + 9], dtype=np.int64)
    vals = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    k2 = TimeSegmentedKernel(m, {"d": 10})
    got = m.lower(k2.process(keys, ts, m.lift(vals))["d"])
    exp = np.concatenate(
        [
            m.lower(sliding_time_window(m, ts[i : i + 2], m.lift(vals[i : i + 2]), 10))
            for i in (0, 2, 4)
        ]
    )
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("name", ["sum", "max"])
def test_positional_segmented_sawtooth_vs_brute(name):
    """PositionalSegmentedKernel (sawtooth start_fn) over chunked
    multi-key input must equal the brute per-row fold, including carry of
    the open segment's position counter + tail across chunk cuts."""
    from sliding_window_aggregators_spark.operators.kernels import (
        PositionalSegmentedKernel,
    )

    rng = np.random.default_rng(11)
    m = get_monoid(name, np.int64)
    PERIOD = 13
    keys, vals = [], []
    for k in range(5):
        n = int(rng.integers(1, 90))
        keys.append(np.full(n, f"k{k}", dtype=object))
        vals.append(rng.integers(-20, 50, size=n).astype(np.int64))
    key_arr = np.concatenate(keys)
    val_arr = np.concatenate(vals)

    kernel = PositionalSegmentedKernel(
        m, lambda rn: rn - (rn % PERIOD), PERIOD - 1
    )
    cuts = sorted(rng.choice(np.arange(1, len(key_arr)), size=6, replace=False))
    got = []
    for lo, hi in zip([0] + list(cuts), list(cuts) + [len(key_arr)]):
        got.append(m.lower(kernel.process(key_arr[lo:hi], m.lift(val_arr[lo:hi]))))
    got = np.concatenate(got)

    exp = []
    for v in vals:
        for i in range(len(v)):
            s = i - (i % PERIOD)
            exp.append(m.lower1(m.lift_reduce(v[s : i + 1])))
    assert np.array_equal(got, np.array(exp)), name


def test_positional_negative_start_clamps_to_segment():
    """A start_fn that can return a position before the segment start must
    clamp — not fold in the previous key's rows or wrap to the array end."""
    from sliding_window_aggregators_spark.operators.kernels import (
        PositionalSegmentedKernel,
    )

    for name in ("sum", "max"):  # prefix-diff path and sparse-table path
        m = get_monoid(name)
        k = PositionalSegmentedKernel(m, lambda rn: rn - 2, 2)
        keys = np.array(["A"] * 5 + ["B"] * 3)
        vals = np.array([100.0] * 5 + [1.0, 1.0, 1.0])
        out = m.lower(k.process(keys, m.lift(vals)))
        if name == "sum":
            assert out[5:].tolist() == [1.0, 2.0, 3.0]
        else:
            assert out[5:].tolist() == [1.0, 1.0, 1.0]
    # single key, max: rn-1 at row 0 must not wrap to the array end
    m = get_monoid("max")
    k = PositionalSegmentedKernel(m, lambda rn: np.maximum(rn - 1, rn - 1), 1)
    out = m.lower(k.process(np.array(["x"] * 4), m.lift(np.array([5.0, 1.0, 1.0, 9.0]))))
    assert out.tolist() == [5.0, 5.0, 1.0, 9.0]


def test_positional_rn_carries_across_empty_tail_boundary():
    """The absolute position counter must survive a batch boundary even
    when the look-back tail is empty (start_fn(next rn) needs no rows but
    the rn-dependent branch must not reset to 0)."""
    from sliding_window_aggregators_spark.operators.kernels import (
        PositionalSegmentedKernel,
    )

    m = get_monoid("sum")

    def start_fn(rn):
        return np.where(rn < 8, rn - rn % 4, rn - rn % 8)

    vals = np.arange(16, dtype=np.float64)
    keys = np.array(["k"] * 16)
    one = PositionalSegmentedKernel(m, start_fn, 7)
    exp = m.lower(one.process(keys, m.lift(vals))).tolist()
    two = PositionalSegmentedKernel(m, start_fn, 7)
    got = (
        m.lower(two.process(keys[:8], m.lift(vals[:8]))).tolist()
        + m.lower(two.process(keys[8:], m.lift(vals[8:]))).tolist()
    )
    assert got == exp


def test_time_kernel_query_deterministic_under_duplicate_timestamps(spark, tmp_path):
    """Per-arrival tie rule, end to end: duplicate (user_id, ts) rows must
    give deterministic per-row results that the band-join oracle (which
    encodes the same (ts, event_id) arrival order) reproduces exactly —
    a RANGE-frame oracle cannot (it includes later same-ts peers)."""
    import os

    import duckdb
    import pandas as pd

    from sliding_window_aggregators_spark.plans.events_queries import (
        ORACLE_TIME_RANGE_SUM_KERNEL,
        q_time_range_sum_kernel,
    )

    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame(
        {
            "event_id": np.arange(8),
            "ts": [base, base,
                   base + pd.Timedelta("10min"), base + pd.Timedelta("10min"),
                   base + pd.Timedelta("10min"),
                   base + pd.Timedelta("2h"), base + pd.Timedelta("2h"),
                   base + pd.Timedelta("3h")],
            "user_id": [1] * 8,
            "event_type": ["x"] * 8,
            "value": [0.2, 0.3, 0.5, 0.7, 1.1, 1.3, 1.7, 1.9],
            "props": ["{}"] * 8,
        }
    )
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    got = (
        q_time_range_sum_kernel(spark, str(tmp_path))
        .toPandas()
        .sort_values("event_id")["hsum_cents"]
        .tolist()
    )
    con = duckdb.connect()
    con.sql(
        f"create view events as select * from "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    exp = (
        con.sql(ORACLE_TIME_RANGE_SUM_KERNEL)
        .df()
        .sort_values("event_id")["hsum_cents"]
        .tolist()
    )
    assert got == exp == [20, 50, 100, 170, 280, 130, 300, 490]
