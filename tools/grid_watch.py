"""Probe-gated single-core kernel-grid confirmation run.

Round-4 verdict item 1: BENCH_r04's kernel grids ran at half of r3's
memory bandwidth (probe 1,998 vs 4,086 MB/s), so the apparent ~0.8×
sum/geomean/bloom dips and the latency p99 tails are window-suspect.
This watcher polls the 1-proc membw probe and, the moment the window is
at least as healthy as r3's (default ≥ 3,800 MB/s), runs ONLY the
single-core sections — kernel grid (5 samples/config), sketch grid,
latency distribution — and writes the JSON (with before/after probes)
to --out. Cheap (~2-4 min of single-core work), so it can fire where
the full bench suite cannot.

Usage:
    python tools/grid_watch.py --out /tmp/grid_confirm.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-bw", type=float, default=3800.0)
    ap.add_argument("--interval", type=float, default=180.0)
    ap.add_argument("--max-wait-s", type=float, default=18000.0)
    ap.add_argument("--out", default="/tmp/grid_confirm.json")
    args = ap.parse_args()

    import bench

    t0 = time.time()
    while (time.time() - t0) < args.max_wait_s:
        bw = bench._vm_membw()
        print(f"probe {bw:,.0f} MB/s (gate {args.min_bw:,.0f})", flush=True)
        if bw < args.min_bw:
            time.sleep(args.interval)
            continue
        report = {"vm_membw_MBps_before": bw}
        report["kernel_turns_per_sec"] = bench.kernel_throughput(samples=5)
        report["sketch_turns_per_sec"] = bench.sketch_throughput()
        report["kernel_latency"] = bench.kernel_latency()
        report["vm_membw_MBps_after"] = bench._vm_membw()
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}", flush=True)
        # a window that shifted mid-run invalidates the confirmation —
        # keep watching unless the closing probe was still healthy
        if report["vm_membw_MBps_after"] >= args.min_bw * 0.8:
            return
        print("window shifted mid-run — staying armed", flush=True)
        time.sleep(args.interval)
    print("max wait reached", flush=True)


if __name__ == "__main__":
    main()
