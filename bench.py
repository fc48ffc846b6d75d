"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Also reports (extra keys) the SWAG kernel throughput grid — sustained
turns/sec for window sizes spanning the reference benchmark_driver's
2^2..2^22 range (experiments/run_fifo.py:5-30) over the synthetic
transcripts stream — mirroring BASELINE.md's protocol (throughput =
events / core runtime, warm-up excluded, anti-DCE sink on every query
result per cpp/src/benchmark_core.h:28-42,112).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "sliding_basic_w100",
    "sliding_argmax_collect_w100",
    "kernel_sum_w100",
    "bucketed_sum_w100",
    "kernel_max_w100",
    "kernel_argmax_w100",
    "kernel_stats_w100",
    "kernel_bloom_w100",
    "kernel_sketch_w100",
    "kernel_sum_w16384",
    "time_range_sum_1h",
    "csv_time_range_sum_1h",
    "conv_timeout_30m",
    "ooo_stream_sum_1h",
    "sawtooth_sum_w50",
    "dedup_simhash_pairs",
    "tumbling_sum_1h",
    "session_30m",
    "asof_join_signup_purchase",
    "cep_three_rising",
    "cep_funnel_1h",
    "user_stats",
    "dedup_exact",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash32",
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embed_neardup_lsh",
    "shared_windows_3x",
    "shared_hll_3x",
    "multimodal_meta",
    "multimodal_features",
    "hll_users_by_type",
    "pack_sequences",
    "stratified_sample",
    "repetition_ratio",
    "tfidf_top_terms",
    "pii_scan",
    "decontaminate",
    "pricing_summary",
    "customer_running_total",
    "region_revenue",
    "weekly_retention",
]

# window grid: a sample of benchmark_driver's 2^2..2^22 (full grid in
# bench_scaling.py / BENCH/BASELINE.md)
KERNEL_GRID = [2**2, 2**6, 2**10, 2**14, 2**18, 2**22]
KERNEL_OPS = ["sum", "geomean", "bloom"]
KERNEL_N = 2**22  # turns per measurement


def kernel_throughput(scale: int = 1, samples: int = 3) -> dict:
    """Pure-kernel turns/sec (the executor-core inner loop the Spark job
    runs per partition): steady-state evict+insert+query per turn over the
    reference value stream, vectorized in micro-batches of 64k rows.
    ``scale`` divides the iteration counts (used when the sandbox host is
    throttled, so the grid still completes; rates stay comparable)."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import SlidingCountWindow

    global KERNEL_N
    KERNEL_N = max(2**18, 2**22 // scale)
    vals = (1 + (np.arange(KERNEL_N) % 101)).astype(float)
    out = {}
    sink = 0.0  # anti-DCE accumulator (benchmark_core.h:28-42)
    # the reference records 5 samples per config (run_utility.py:80,98);
    # the caller passes 5 when the membw probe says the window is healthy
    # and 3 as the throttled fallback (median either way, so one bad
    # window slice can't masquerade as a kernel regression)
    for op in KERNEL_OPS:
        n = KERNEL_N if op != "bloom" else KERNEL_N // 8
        data = vals[:n] if op != "bloom" else vals[:n].astype(int)
        for w in KERNEL_GRID:
            rates = []
            for _ in range(samples):
                m = get_monoid(op)
                k = SlidingCountWindow(m, w)
                # warm-up: fill the window before the clock starts
                # (benchmark_core.h:100-109)
                warm = min(w, n // 2)
                k.process(data[:warm])
                t0 = time.perf_counter()
                step = 65536
                i = warm
                while i < n:
                    res = k.process(data[i : i + step])
                    sink += float(res[-1] if res.dtype.kind == "f" else res[-1])
                    i += step
                dt = time.perf_counter() - t0
                rates.append((n - warm) / dt)
            rates.sort()
            out[f"{op}_w{w}"] = round(rates[len(rates) // 2], 1)
    out["_anti_dce"] = sink
    return out


def sketch_throughput(scale: int = 1) -> dict:
    """Turns/sec for the beyond-reference extension monoids (hll
    registers, histq bucket counts, cms counters — vector partials —
    plus the packed CEP dfa) through the same steady-state count-window
    loop as the main grid; reported under a separate key so the main
    grid stays protocol-identical to the reference's sum/geomean/bloom
    set."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import SlidingCountWindow

    n = max(2**16, 2**20 // scale)
    vals = (1 + (np.arange(n) % 10007)).astype(np.int64)  # int inputs (hash/cents)
    out = {}
    sink = 0.0
    for op in ("hll", "histq", "cms", "dfa", "top3", "minhash", "adjsum",
               "trend", "toolset", "maxrun", "maxgap"):
        for w in (2**6, 2**14):
            m = get_monoid(op)
            k = SlidingCountWindow(m, w)
            warm = min(w, n // 2)
            k.process(vals[:warm])
            t0 = time.perf_counter()
            step = 65536
            i = warm
            while i < n:
                res = k.process(vals[i : i + step])
                sink += float(res[-1])
                i += step
            out[f"{op}_w{w}"] = round((n - warm) / (time.perf_counter() - t0), 1)
    out["_anti_dce"] = sink
    return out


def panes_throughput(scale: int = 1) -> dict:
    """Turns/sec through the pane-sliced rollup kernel (_panes_step — the
    per-key inner loop of sliding_panes_stream): each turn folds into one
    slide-aligned pane partial; the advancing watermark closes windows of
    ``n_panes`` panes through the disjoint-sparse-table interval fold.
    Configs vary size/slide (16 vs 256 panes/window) plus one
    4-slide-jitter OOO arrival config (commutative monoid → exact); the
    emitted-window count rides along so rates are interpretable (per-turn
    cost is O(1) + amortized closures, not per-turn emission like the
    count-window grids)."""
    import numpy as np
    import pandas as pd

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.streaming.engine import (
        _panes_empty_state,
        _panes_step,
    )

    from sliding_window_aggregators_spark.streaming.engine import (
        _PANES_NEG,
        _panes_multi_step,
    )

    n = max(2**18, 2**21 // scale)
    slide_us = 60_000_000
    rows_per_pane = 1024
    ts = (
        np.sort(np.arange(n, dtype=np.int64) * slide_us // rows_per_pane)
    )
    vals = (1 + (np.arange(n) % 101)).astype(np.float64)
    out = {}
    sink = 0.0
    for label, n_panes, jitter in (
        ("sum_p16", 16, 0), ("sum_p256", 256, 0), ("sum_p16_ooo", 16, 4)
    ):
        t = ts.copy()
        if jitter:
            rng = np.random.default_rng(42)
            t = t + rng.integers(0, jitter * slide_us, size=n)
        m = get_monoid("sum")
        d = _panes_empty_state(m)
        windows = 0
        step = 65536
        t0 = time.perf_counter()
        for i in range(0, n, step):
            pdf = pd.DataFrame(
                {
                    "ts": t[i : i + step].astype("datetime64[us]"),
                    "__v": vals[i : i + step],
                }
            )
            # watermark trails max event time by the jitter horizon, the
            # streaming runtime's contract
            wm = int(t[i : i + step].max()) - jitter * slide_us
            emitted, d = _panes_step(
                d, pdf, wm, monoid=m, ts_col="ts",
                size_us=n_panes * slide_us, slide_us=slide_us,
                int_values=False,
            )
            if emitted is not None:
                windows += len(emitted["window_end"])
                sink += float(emitted["values"][-1])
        dt = time.perf_counter() - t0
        out[f"{label}"] = round(n / dt, 1)
        out[f"{label}_windows"] = windows
    # pre-combined ingestion (r5): the same in-order stream, but each
    # step's raw rows are folded into per-pane partials FIRST (the
    # map-side _pane_precombine fold, timed INCLUSIVE — single-threaded
    # here; at scale it runs in the parallel map stage) and the kernel
    # ingests partial rows via pre_col. Shows the end-to-end per-core
    # cost of the decomposed path and the state-side row reduction
    # (1024 raw rows -> 1 partial per pane).
    import pickle as _pickle

    from sliding_window_aggregators_spark.functions.monoids import p_take
    from sliding_window_aggregators_spark.operators.kernels import (
        interval_fold,
    )

    m = get_monoid("sum")
    d = _panes_empty_state(m)
    windows = 0
    step = 65536
    t0 = time.perf_counter()
    for i in range(0, n, step):
        t_raw = ts[i : i + step]
        v_raw = vals[i : i + step]
        pane = t_raw - t_raw % slide_us
        newg = np.flatnonzero(np.diff(pane)) + 1
        gs = np.concatenate(([0], newg))
        ge = np.concatenate((newg, [len(pane)]))
        bp = interval_fold(m, m.lift(v_raw), gs, ge)
        pdf = pd.DataFrame(
            {
                "ts": np.maximum.reduceat(t_raw, gs).astype(
                    "datetime64[us]"
                ),
                "__pre": [
                    _pickle.dumps([p_take(bp, [g])])
                    for g in range(len(gs))
                ],
            }
        )
        emitted, d = _panes_step(
            d, pdf, int(t_raw.max()), monoid=m, ts_col="ts",
            size_us=16 * slide_us, slide_us=slide_us, int_values=False,
            pre_col="__pre",
        )
        if emitted is not None:
            windows += len(emitted["window_end"])
            sink += float(emitted["values"][-1])
    dt = time.perf_counter() - t0
    out["sum_p16_pre"] = round(n / dt, 1)
    out["sum_p16_pre_windows"] = windows
    # shared-pane multi: (sum, max, mincount) x (16, 64 panes) through
    # ONE pane layer — the marginal cost of 3 monoids x 2 sizes over
    # the single-config ingestion (one fold per spec per turn, K extra
    # sizes = K extra interval folds at closure time only)
    ms = [get_monoid(nm) for nm in ("sum", "max", "mincount")]
    d = {
        "pane_ts": np.empty(0, np.int64),
        "partials": [m.identity(0) for m in ms],
        "last_emit": _PANES_NEG,
        "v": 1,
    }
    windows = 0
    step = 65536
    t0 = time.perf_counter()
    for i in range(0, n, step):
        pdf = pd.DataFrame(
            {
                "ts": ts[i : i + step].astype("datetime64[us]"),
                "__v": vals[i : i + step],
            }
        )
        per_size, d = _panes_multi_step(
            d, pdf, int(ts[i : i + step].max()), monoids=ms,
            val_cols=["__v", "__v", "__v"], ts_col="ts",
            sizes_us=[16 * slide_us, 64 * slide_us], slide_us=slide_us,
            int_flags=[False, False, False],
        )
        for emitted in per_size:
            if emitted is not None:
                windows += len(emitted["window_end"])
                sink += float(emitted["values"][0][-1])
    dt = time.perf_counter() - t0
    out["multi3x2_p16_64"] = round(n / dt, 1)
    out["multi3x2_p16_64_windows"] = windows
    out["_anti_dce"] = sink
    return out


def _ooo_prefill(st, m, w: int, d: int, n: int):
    """The reference's permanent-OOO pre-fill (benchmark_core.h:192-197):
    d timestamps from the FAR FUTURE ([n−d, n)) plus the first w−d
    in-order — every subsequent insert then lands exactly d entries below
    the window tip, forever (the future block is never overtaken)."""
    import numpy as np

    if d:
        fut = np.arange(n - d, n, dtype=np.int64)
        st.bulk_insert(fut, m.lift(1 + (fut % 101)))
    pre = np.arange(0, w - d, dtype=np.int64)
    st.bulk_insert(pre, m.lift(1 + (pre % 101)))
    assert st.size() == w


def ooo_throughput() -> dict:
    """Out-of-order kernel throughput (≡ ooo_benchmark_driver,
    cpp/src/benchmark_core.h:185-247: pre-fill d future timestamps + w−d
    in-order, then steady evict-oldest + insert-at-(t−d) + query — every
    insert lands PERMANENTLY d-deep below the future block), driven
    bulk-wise: each micro-batch is a bulkInsert (one real d-entry suffix
    merge per batch when d > 0) + one bulkEvict + query.

    Key-semantics note: before round 3 this grid merely shifted the
    stream by d, which is OOO only on the first batch — r01/r02
    `ooo_sum_*` values are not comparable with r03+."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import OrderedAggState

    out = {}
    w = 2**16
    n = 2**20
    step = 65536
    m = get_monoid("sum")
    sink = 0.0
    for d in [0, w // 4]:
        st = OrderedAggState(m)
        _ooo_prefill(st, m, w, d, n)
        t0 = time.perf_counter()
        for lo in range(w - d, n - d, step):
            ts = np.arange(lo, lo + step, dtype=np.int64)
            st.bulk_insert(ts, m.lift(1 + (ts % 101)))
            st.bulk_evict(int(st.oldest()) + step - 1)
            sink += st.query()
        dt = time.perf_counter() - t0
        out[f"ooo_sum_w{w}_d{d}"] = round((n - w) / dt, 1)
    # range-query-heavy variant (window sharing): 3 rangeQuery folds per
    # batch on top of the permanent-OOO ingest — exercises the
    # incremental tree (lazy spine repair + O(log n) canonical
    # decomposition; round 1 rebuilt the whole tree per mutated batch)
    d = w // 4
    st = OrderedAggState(m)
    _ooo_prefill(st, m, w, d, n)
    t0 = time.perf_counter()
    for lo in range(w - d, n - d, 16384):
        ts = np.arange(lo, lo + 16384, dtype=np.int64)
        st.bulk_insert(ts, m.lift(1 + (ts % 101)))
        st.bulk_evict(int(st.oldest()) + 16384 - 1)
        y = int(ts[-1])
        for dur in (w // 8, w // 2, w):
            sink += st.range_query(y - dur, y)
    out[f"ooo_rq3_w{w}_d{d}"] = round((n - w) / (time.perf_counter() - t0), 1)
    out["_anti_dce"] = sink
    return out


def bulk_throughput(scale: int = 1) -> dict:
    """Bulk-op protocol parity with the reference's bulk benchmarks
    (experiments/run_bulk_evict.py:5-36, run_bulk_evict_insert.py:5-45,
    cpp/src/benchmark_core.h:249-470): w = 2^22 (the reference's 4M),
    bulk sizes swept over {1, 1K, 64K, 2M}, sum monoid, anti-DCE query
    sink every round.

    - ``evict_insert_b{B}``: each round bulk-evicts the B oldest then
      bulk-inserts B new entries at the tip (both ops bulked — the
      micro-batch engine's native shape).
    - ``evict_b{B}``: inserts arrive in 4K micro-batches (query per
      batch); evictions amortize into ONE bulkEvict per B accumulated —
      isolates bulk_evict cost from insert granularity.
    - ``ooo_insert_b65536_deg{D}``: permanent out-of-order ingest — every
      round appends the on-time part then bulk-inserts a D-deep late
      chunk (the run_bulk_evict_insert ooo-degree axis); each late chunk
      displaces a live suffix, so every round pays a real suffix merge,
      unlike the d-shifted-but-in-order ooo_turns_per_sec grid."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import OrderedAggState

    m = get_monoid("sum")
    w = max(2**18, 2**22 // scale)
    out = {}
    sink = 0.0

    def fresh():
        st = OrderedAggState(m)
        ts0 = np.arange(w, dtype=np.int64)
        st.bulk_insert(ts0, m.lift(1 + (ts0 % 101)))
        return st

    for bulk in (1, 1024, 65536, 2**21):
        bulk = min(bulk, w // 2)
        # rounds sized so small bulks finish (reference divides its
        # iteration budget for slow configs the same way)
        turns = min(2**22 // scale, max(2**16 // scale, bulk * 64))
        rounds = max(1, turns // bulk)
        st = fresh()
        tip = w
        t0 = time.perf_counter()
        for _ in range(rounds):
            st.bulk_evict(int(st.oldest()) + bulk - 1)
            ts = np.arange(tip, tip + bulk, dtype=np.int64)
            st.bulk_insert(ts, m.lift(1 + (ts % 101)))
            tip += bulk
            sink += st.query()
        dt = time.perf_counter() - t0
        out[f"evict_insert_b{bulk}"] = round(rounds * bulk / dt, 1)

        # evict-isolated variant: inserts arrive in 4K micro-batches
        # (query per batch); ONE amortized bulkEvict per B accumulated.
        # Only meaningful when B exceeds the insert granularity — below
        # 4K it would silently measure 4K evictions under a smaller label
        step = 4096
        if bulk > step:
            st = fresh()
            tip = w
            since_evict = 0
            t0 = time.perf_counter()
            for _ in range(max(1, rounds * bulk // step)):
                ts = np.arange(tip, tip + step, dtype=np.int64)
                st.bulk_insert(ts, m.lift(1 + (ts % 101)))
                tip += step
                since_evict += step
                if since_evict >= bulk:
                    st.bulk_evict(int(st.oldest()) + since_evict - 1)
                    since_evict = 0
                sink += st.query()
            dt = time.perf_counter() - t0
            out[f"evict_b{bulk}"] = round(
                max(1, rounds * bulk // step) * step / dt, 1
            )

    bulk = min(65536, w // 4)
    for deg in (1024, 16384):
        deg = min(deg, bulk // 2)
        st = fresh()
        tip = w
        rounds = max(1, (2**21 // scale) // bulk)
        t0 = time.perf_counter()
        for _ in range(rounds):
            on_time = np.arange(tip + deg, tip + bulk, dtype=np.int64)
            st.bulk_insert(on_time, m.lift(1 + (on_time % 101)))
            late = np.arange(tip, tip + deg, dtype=np.int64)  # lands deg-deep
            st.bulk_insert(late, m.lift(1 + (late % 101)))
            tip += bulk
            st.bulk_evict(int(st.youngest()) - w)
            sink += st.query()
        dt = time.perf_counter() - t0
        out[f"ooo_insert_b{bulk}_deg{deg}"] = round(rounds * bulk / dt, 1)
    out["_anti_dce"] = sink
    return out


def dynamic_throughput(scale: int = 1) -> dict:
    """Dynamic fill/drain window (run_dynamic.py:5-33,
    cpp/src/benchmark_core.h:149-183): the window refills to P then
    resets — the sawtooth variable-size scenario — through the
    PositionalSegmentedKernel (the same kernel the sawtooth_sum_w50
    driver query runs), streamed in 64K micro-batches."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators.kernels import (
        PositionalSegmentedKernel,
    )

    n = max(2**18, 2**22 // scale)
    vals = (1 + (np.arange(n) % 101)).astype(float)
    out = {}
    sink = 0.0
    for p in (2**6, 2**14):
        m = get_monoid("sum")
        k = PositionalSegmentedKernel(m, lambda rn, p=p: rn - rn % p, p - 1)
        keys = np.zeros(65536, dtype=np.int64)
        t0 = time.perf_counter()
        i = 0
        while i < n:
            chunk = vals[i : i + 65536]
            res = m.lower(k.process(keys[: len(chunk)], m.lift(chunk)))
            sink += float(res[-1])
            i += 65536
        out[f"sum_p{p}"] = round(n / (time.perf_counter() - t0), 1)
    out["_anti_dce"] = sink
    return out


def kernel_latency() -> dict:
    """Micro-batch latency distribution (≡ the reference's latency mode,
    cpp/src/benchmark_core.h:122-146, adapted to the micro-batch engine:
    the per-op rdtsc histogram becomes per-64k-batch wall percentiles)."""
    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import SlidingCountWindow

    w, step = 16384, 65536
    out = {}
    for op in ["sum", "geomean", "bloom"]:
        # bloom folds 512-byte partials (~100× slower per turn, as in the
        # reference's ÷100 iteration budget for bloom) — fewer batches,
        # still ≥ 30 latency samples
        n = 2**22 if op != "bloom" else w + 32 * step
        vals = (1 + (np.arange(n) % 101)).astype(
            float if op != "bloom" else np.int64
        )
        k = SlidingCountWindow(get_monoid(op), w)
        # warm-up = window fill + ONE full-size batch: the first batch
        # after construction lazily allocates the kernel's ring/arena
        # buffers (a one-time ~2.5× spike that r02 mis-reported as p99
        # tail); the reference's clock likewise starts only after the
        # window is in steady state (benchmark_core.h:100-109)
        k.process(vals[: w + step])
        lats = []
        for i in range(w + step, n, step):
            t0 = time.perf_counter()
            k.process(vals[i : i + step])
            lats.append(time.perf_counter() - t0)
        lats = np.array(lats) * 1e3
        out[f"{op}_batch_ms_p50"] = round(float(np.percentile(lats, 50)), 3)
        out[f"{op}_batch_ms_p99"] = round(float(np.percentile(lats, 99)), 3)
        out[f"{op}_batch_ms_max"] = round(float(lats.max()), 3)
    return out


def _vm_membw() -> float:
    """1-process memory-bandwidth probe (MB/s). This sandbox's host
    throttles unpredictably (observed 22 MB/s – 29 GB/s on an idle guest);
    reporting the probe lets a reader normalize a slow run."""
    import numpy as np

    a = np.ones(50_000_000, dtype=np.uint8)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2:
        b = a.copy()
        a[0] = b[0]
        n += 1
    return round(n * 50 / (time.perf_counter() - t0), 1)


def _vm_cpu_mops() -> float:
    """Single-core CPU probe (fixed pure-python add loop, Mops/s). The
    host throttles CPU independently of memory bandwidth — round 5
    measured the full query suite uniformly 2-3x slower (including
    pure-SQL rows no code change touched) in a window whose membw probe
    looked acceptable but whose CPU ran a calibrated loop at half speed.
    Reporting both probes makes every run's window fully legible:
    query-suite wall times track THIS number; kernel-grid rates track
    the membw one. Healthy-window reference on this box: ~17-19 Mops."""
    t0 = time.perf_counter()
    s = 0
    n = 20_000_000
    for i in range(n):
        s += i
    dt = time.perf_counter() - t0
    return round(n / dt / 1e6, 1)


def _wait_for_window(min_bw: float, max_wait_s: float) -> float:
    """Bounded wait for a healthy host window (round-4 verdict item 1):
    poll the membw probe up to ``max_wait_s`` seconds and return the last
    probe. If the window never turns healthy, the run proceeds anyway —
    every number is annotated with its probe, so a throttled run is
    normalizable, just less comparable across rounds. Configure via
    SWAG_BENCH_MIN_BW_MBPS / SWAG_BENCH_MAX_WAIT_S (0 disables)."""
    t0 = time.perf_counter()
    bw = _vm_membw()
    while bw < min_bw and (time.perf_counter() - t0) < max_wait_s:
        print(
            f"# host throttled (membw {bw:,.0f} MB/s < {min_bw:,.0f}) — "
            f"waiting for a healthy window "
            f"({int(time.perf_counter() - t0)}/{int(max_wait_s)}s)",
            file=sys.stderr,
        )
        time.sleep(30)
        bw = _vm_membw()
    return bw


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    membw = _wait_for_window(
        float(os.environ.get("SWAG_BENCH_MIN_BW_MBPS", "3000")),
        float(os.environ.get("SWAG_BENCH_MAX_WAIT_S", "600")),
    )
    cpu_mops = _vm_cpu_mops()  # before Spark starts: uncontended core

    import __spark_entry__ as entry
    from sliding_window_aggregators_spark.sources import get_spark

    spark = get_spark(app="swag-bench", cpus=cpus)
    qs = entry.queries()
    # session warm-up (JVM JIT, Arrow, python workers) excluded from query
    # timings, mirroring the reference's warm-up discipline
    # (cpp/src/benchmark_core.h:100-109)
    qs["user_stats"](spark, sf_dir).count()
    qs["kernel_sum_w100"](spark, sf_dir).count()
    # build the one-time bucketed/CSV cache layouts during warm-up so the
    # timed rows measure the scan paths, not the one-time conversions
    qs["bucketed_sum_w100"](spark, sf_dir).count()
    qs["csv_time_range_sum_1h"](spark, sf_dir).count()
    spark.catalog.clearCache()
    times = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # forces full execution; count is the anti-DCE sink
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt
        if name == "ooo_stream_sum_1h":
            from sliding_window_aggregators_spark.plans import events_queries

            drain = events_queries.LAST_OOO_STREAM_DRAIN_SEC
            times["ooo_stream_sum_1h_drain_only"] = (
                round(drain, 3) if drain is not None else None
            )
            note = (
                f"  [8 data micro-batches + watermark tail; stream drain only: "
                f"{drain:.3f}s — rest is cached-layout check + readback]"
                if drain is not None
                else "  [8 data micro-batches + watermark tail]"
            )
        elif name == "conv_timeout_30m":
            from sliding_window_aggregators_spark.plans import events_queries

            drain = events_queries.LAST_TIMEOUT_STREAM_DRAIN_SEC
            note = (
                f"  [5 checkpointed micro-batches, event-time timers, "
                f"RocksDB; stream drain only: {drain:.3f}s]"
                if drain is not None
                else "  [event-time-timer CEP stream]"
            )
        elif name == "kernel_sketch_w100":
            # fused-kernel count grew across rounds (r4: 6, r5: 8 —
            # +minhash, +toolset); label so cross-round walls compare fair
            note = "  [8 fused kernels this round (r4 ran 6)]"
        elif name == "kernel_stats_w100":
            note = "  [7 fused kernels this round (r4 ran 3)]"
        else:
            note = ""
        print(f"# {name}: {dt:.3f}s ({n} rows){note}", file=sys.stderr)
        # drop per-query persisted blocks so later timings aren't skewed
        # by earlier queries' cache occupancy
        spark.catalog.clearCache()

    # under host throttling (see _vm_membw) shrink the kernel grids so the
    # run still completes; rates are per-turn and stay comparable
    scale = 1 if membw >= 1000 else (8 if membw >= 100 else 64)
    # healthy window → the reference's 5 samples/config; throttled → 3
    samples = 5 if membw >= 1000 else 3
    kt = kernel_throughput(scale, samples)
    result = {
        "metric": "headline_suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "kernel_turns_per_sec": kt,
        "sketch_turns_per_sec": sketch_throughput(scale),
        "ooo_turns_per_sec": ooo_throughput(),
        "panes_turns_per_sec": panes_throughput(scale),
        "bulk_turns_per_sec": bulk_throughput(scale),
        "dynamic_turns_per_sec": dynamic_throughput(scale),
        "kernel_latency": kernel_latency(),
        "kernel_grid_samples": samples,
        "cpus": cpus,
        "vm_membw_MBps": membw,
        "vm_cpu_Mops": cpu_mops,
        "vm_cpu_Mops_after": _vm_cpu_mops(),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
