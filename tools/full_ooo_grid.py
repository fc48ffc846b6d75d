"""Probe-gated FULL out-of-order distance sweep: the reference's run_ooo
protocol (experiments/run_ooo.py:16-31 — window 4M, OOO degrees
d ∈ {1, 2, 4, …, 4M}, sum/geomean/bloom, 5 samples/config) against the
engine's OrderedAggState (the FiBA-equivalent incremental segment tree).

bench.py's per-round grid samples two distances (d=0, d=w/4); this tool
runs the complete 23-point degree axis once, with membw/cpu probes
embedded before and after. Iterations are scaled from the reference's
100M to fit the sandbox (n turns per measurement below) — rates are
turns/sec so the numbers remain comparable across BENCH_r*.json.

Semantics identical to bench.py's ooo_throughput (benchmark_core.h:
185-247 permanent-OOO construction): pre-fill d far-future timestamps +
w−d in-order, then steady bulkInsert (one real d-deep suffix merge per
batch) + bulkEvict + query.

Usage:
    python tools/full_ooo_grid.py [--min-bw 3000] [--max-wait-s 1800]
                                  [--out BENCH/bench_r5_full_ooo_grid.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-bw", type=float, default=3000.0)
    ap.add_argument("--max-wait-s", type=float, default=1800.0)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument(
        "--out", default=os.path.join(HERE, "BENCH", "bench_r5_full_ooo_grid.json")
    )
    args = ap.parse_args()

    import numpy as np

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import OrderedAggState

    bw = bench._wait_for_window(args.min_bw, args.max_wait_s)
    cpu = bench._vm_cpu_mops()

    w = 2**22  # the reference's base window (4M)
    degrees = [2**i for i in range(0, 23)]  # 1 .. 4M (= w: fully inverted)
    step = 65536
    grid = {}
    sink = 0.0
    t_start = time.perf_counter()
    # bloom runs 8x fewer turns and 3 samples (vs the reference's own
    # 100x iteration cut for bloom, run_ooo.py:31) — its 512-byte vector
    # partials make large-d suffix merges ~100x slower than sum's scalars
    for op, iters, samples in (
        ("sum", 2**20, args.samples),
        ("geomean", 2**20, args.samples),
        ("bloom", 2**17, min(3, args.samples)),
    ):
        m = get_monoid(op)
        for d in degrees:
            d = min(d, w)  # d == w: every insert lands below the whole window
            n = w + iters
            rates = []
            for _ in range(samples):
                st = OrderedAggState(m)
                bench._ooo_prefill(st, m, w, d, n)
                t0 = time.perf_counter()
                for lo in range(w - d, n - d, step):
                    ts = np.arange(lo, min(lo + step, n - d), dtype=np.int64)
                    st.bulk_insert(ts, m.lift(1 + (ts % 101)))
                    st.bulk_evict(int(st.oldest()) + len(ts) - 1)
                    sink += float(st.query())
                rates.append(iters / (time.perf_counter() - t0))
            rates.sort()
            grid[f"ooo_{op}_w{w}_d{d}"] = round(rates[len(rates) // 2], 1)
    rec = {
        "grid": "full OOO degree sweep d=2^0..2^22 at w=2^22 "
                f"({args.samples} samples/config, median)",
        "ops": {"sum": 2**20, "geomean": 2**20, "bloom": 2**17},
        "ooo_turns_per_sec": grid,
        "wall_sec": round(time.perf_counter() - t_start, 1),
        "_anti_dce": sink,
        "vm_membw_MBps_before": bw,
        "vm_cpu_Mops_before": cpu,
        "vm_membw_MBps_after": bench._vm_membw(),
        "vm_cpu_Mops_after": bench._vm_cpu_mops(),
    }
    with open(args.out, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in rec.items() if k != "_anti_dce"},
                     sort_keys=True))


if __name__ == "__main__":
    main()
