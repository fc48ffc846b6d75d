"""CPU-bound two-cluster-size scaling study — throttle-immune variant.

The primary study (bench_scaling.py) is memory-bound and therefore
hostage to this sandbox host's unpredictable memory-bandwidth throttling
(observed 22 MB/s – 29 GB/s single-stream on an idle guest). This
variant runs the SAME Spark job shape — bucketed+sorted scan →
mapInPandas → SegmentedSlidingKernel per turn — but with the reference's
own CPU-stress aggregation, BusyLoop
(cpp/src/AggregationFunctions.hpp:505-552: a ~100-iteration synthetic
combine), so per-turn cost is dominated by compute the host does NOT
throttle (raw CPU scales 0.90+ even in throttled windows — see
BENCH/BASELINE.md). N→4N efficiency then measures the ENGINE's
parallelization of the identical plan, not the host's bandwidth cap.

Usage: python bench_scaling_cpu.py [--turns 1048576] [--convs 4096]
Prints one JSON report; appends nothing (BENCH/BASELINE.md is updated by
hand with the result).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

LAYOUT = r"""
import os, sys
sys.path.insert(0, {here!r})
from pyspark.sql import SparkSession, functions as F
from sliding_window_aggregators_spark.sources import transcripts_spark
spark = (SparkSession.builder.master("local[32]").appName("swag-cpu-layout")
    .config("spark.ui.enabled","false").config("spark.ui.showConsoleProgress","false")
    .config("spark.driver.memory","16g").getOrCreate())
path = {path!r}
if not os.path.exists(path + "/_SUCCESS"):
    df = transcripts_spark(spark, {turns}, n_convs={convs}).select(
        F.xxhash64("conv_id").alias("conv_h"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        (F.length("text") % 7).cast("long").alias("len"))
    (df.repartition(128, "conv_h").sortWithinPartitions("conv_h", "turn_idx")
       .write.mode("overwrite").parquet(path))
spark.stop()
print("LAYOUT_OK")
"""

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {here!r})
import pandas as pd
from pyspark.sql import SparkSession
from sliding_window_aggregators_spark.sources.session import _ship_package

cpus = {cpus}
W = {w}

spark = (SparkSession.builder.master(f"local[{{cpus}}]").appName(f"swag-cpu-{{cpus}}")
    .config("spark.sql.files.maxPartitionBytes", "1g")
    .config("spark.sql.files.openCostInBytes", "1g")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
_ship_package(spark)
inp = spark.read.parquet({path!r})

def gen(batches):
    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.operators import SegmentedSlidingKernel
    m = get_monoid("busyloop")
    k = SegmentedSlidingKernel(m, W)
    sink = 0.0
    rows = 0
    for b in batches:
        conv = b["conv_h"].to_numpy()
        vals = b["len"].to_numpy()
        rows += len(conv)
        out = m.lower(k.process(conv, m.lift(vals)))
        sink += float(out[-1])  # combine sink (benchmark_core.h:28-42)
    yield pd.DataFrame({{"rows": [rows], "sink": [sink]}})

def job():
    return inp.mapInPandas(gen, "rows long, sink double").groupBy().sum("rows").collect()[0][0]

n = job()  # warm-up
dt = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    dt = min(dt, time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "rows": int(n), "sec": dt,
                   "turns_per_sec": n / dt}}))
spark.stop()
"""


def run_sub(code: str) -> str:
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"subprocess failed:\n{r.stderr[-3000:]}")
    return r.stdout


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2:
        x += 1
    return x


def cpu_probe() -> dict:
    with mp.Pool(2) as p:
        lo = sum(p.map(_burn, range(2)))
    with mp.Pool(8) as p:
        hi = sum(p.map(_burn, range(8)))
    return {"raw_cpu_scaling_eff_2_8": round((hi / lo) / 4, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_048_576)
    ap.add_argument("--convs", type=int, default=4096)
    ap.add_argument("--window", type=int, default=64)
    args = ap.parse_args()

    path = f"/tmp/swag_scale/cpu_{args.turns}_{args.convs}"
    os.makedirs("/tmp/swag_scale", exist_ok=True)
    run_sub(LAYOUT.format(here=HERE, path=path, turns=args.turns, convs=args.convs))

    probes = cpu_probe()
    levels = {}
    for c in (2, 8, 32):
        out = run_sub(WORKER.format(here=HERE, cpus=c, w=args.window, path=path))
        line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        levels[c] = json.loads(line)

    def eff(a, b):
        return (levels[b]["turns_per_sec"] / levels[a]["turns_per_sec"]) / (b / a)

    print(json.dumps({
        "job": (
            f"per-turn BusyLoop sliding aggregation (CPU-bound, "
            f"cpp/src/AggregationFunctions.hpp:505-552), w={args.window}, "
            f"{args.turns} turns, {args.convs} convs, bucketed+sorted scan, "
            f"combine sink"
        ),
        "levels": levels,
        "scaling_efficiency_2_to_8": round(eff(2, 8), 3),
        "scaling_efficiency_8_to_32": round(eff(8, 32), 3),
        "vm_context": probes,
    }, indent=2))


if __name__ == "__main__":
    main()
