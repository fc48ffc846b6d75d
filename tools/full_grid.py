"""Probe-gated FULL window-grid run: every size 2^2..2^22, 5 samples.

The reference's benchmark_driver sweeps every window size 2^2..2^22
(cpp/src/benchmark_driver: the -w loop over the full power grid);
bench.py subsamples that grid x16 (6 points) so the per-round suite
stays inside the driver's time budget.  This tool runs the COMPLETE
21-point grid once, 5 samples/config (run_utility.py:80,98), for the
protocol monoids sum/geomean/bloom, with membw+cpu probes embedded
before and after so the window the numbers were measured in is legible.

Usage:
    python tools/full_grid.py [--min-bw 3000] [--max-wait-s 1800]
                              [--out BENCH/bench_r5_full_window_grid.json]

Single-core, pure-kernel (the executor-core inner loop) — identical
methodology to bench.py's kernel_turns_per_sec so the 6 shared points
cross-check directly against every BENCH_r*.json on record.
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
    ap.add_argument(
        "--out", default=os.path.join(HERE, "BENCH", "bench_r5_full_window_grid.json")
    )
    args = ap.parse_args()

    bw = bench._wait_for_window(args.min_bw, args.max_wait_s)
    cpu = bench._vm_cpu_mops()
    bench.KERNEL_GRID = [2**i for i in range(2, 23)]  # the full protocol grid
    t0 = time.perf_counter()
    grid = bench.kernel_throughput(scale=1, samples=5)
    wall = round(time.perf_counter() - t0, 1)
    rec = {
        "grid": "full 2^2..2^22 (21 sizes, 5 samples/config, median)",
        "ops": bench.KERNEL_OPS,
        "turns_per_measurement": bench.KERNEL_N,
        "kernel_turns_per_sec": {k: v for k, v in grid.items() if k != "_anti_dce"},
        "wall_sec": wall,
        "vm_membw_MBps_before": bw,
        "vm_cpu_Mops_before": cpu,
        "vm_membw_MBps_after": bench._vm_membw(),
        "vm_cpu_Mops_after": bench._vm_cpu_mops(),
    }
    with open(args.out, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps(rec, sort_keys=True))


if __name__ == "__main__":
    main()
