"""Same-host A/B: sink read path before vs after compaction.

Builds a sink with many small files (the shape a long-running
micro-batch query produces), times read_committed + a full aggregate
over it, compacts, re-times. Interleaved A/B/A/B, medians reported.

    python tools/ab_compact_read.py [--batches 200] [--files 8]
                                    [--rows 2000] [--reps 3]

Recorded run (BENCH/BASELINE.md): 200x8x2000 -> 1,600 files vs 9,
read+agg 1.38 s vs 0.28 s = 4.93x; the win is per-file overhead, so it
grows with file count, not data size."""
import argparse
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from sliding_window_aggregators_spark.sources import get_spark
from sliding_window_aggregators_spark.streaming import (
    ExactlyOnceParquetSink, audit_sink, compact_sink,
)

ap = argparse.ArgumentParser()
ap.add_argument("--batches", type=int, default=200)
ap.add_argument("--files", type=int, default=8)
ap.add_argument("--rows", type=int, default=2000)
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--cpus", type=int, default=8)
args = ap.parse_args()
N_BATCHES = args.batches
FILES_PER_BATCH = args.files
ROWS_PER_FILE = args.rows


def build(out):
    os.makedirs(os.path.join(out, "_commits"))
    os.makedirs(os.path.join(out, "_metrics"))
    import json
    rid = 0
    for b in range(N_BATCHES):
        bdir = os.path.join(out, f"batch_id={b}")
        os.makedirs(bdir)
        per = {}
        for i in range(FILES_PER_BATCH):
            n = ROWS_PER_FILE
            t = pa.table({
                "conv_id": pa.array(
                    [f"c{(rid + j) % 4096}" for j in range(n)], pa.string()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + (rid + j) * 250_000
                     for j in range(n)], pa.timestamp("us")),
                "wsum": pa.array(
                    [float((rid + j) % 101) for j in range(n)], pa.float64()),
                "_batch_id": pa.array([b] * n, pa.int64()),
                "_partition_id": pa.array([i] * n, pa.int32()),
            })
            name = f"part-{i:05d}.parquet"
            pq.write_table(t, os.path.join(bdir, name))
            per[name] = n
            rid += n
        json.dump({"batch_id": b, "rows": sum(per.values()),
                   "partitions": len(per), "rows_per_file": per},
                  open(os.path.join(out, "_metrics", f"batch_{b}.json"), "w"))
        open(os.path.join(out, "_commits", f"_COMMIT_{b}"), "w").write("ok")


def timed_read(spark, out):
    sink = ExactlyOnceParquetSink(out)
    t0 = time.perf_counter()
    df = sink.read_committed(spark)
    row = df.groupBy().agg({"wsum": "sum", "*": "count"}).collect()[0]
    dt = time.perf_counter() - t0
    return dt, row


base = "/tmp/ab_compact"
shutil.rmtree(base, ignore_errors=True)
small = os.path.join(base, "small")
build(small)
big = os.path.join(base, "big")
shutil.copytree(small, big)
rep = compact_sink(big, keep_last=1)
assert audit_sink(big)["ok"]
print(f"files: {rep['files_before']} -> {rep['files_after']} "
      f"(+{FILES_PER_BATCH} kept batch)", flush=True)

spark = get_spark(app="ab-compact", cpus=args.cpus, shuffle_partitions=args.cpus)
t_small, t_big = [], []
ref = None
for _ in range(args.reps):
    dt, row = timed_read(spark, small)
    t_small.append(dt)
    ref = ref or row
    assert row == ref
    dt, row = timed_read(spark, big)
    t_big.append(dt)
    assert row == ref
print(f"rows={ref[0]} sum={ref[1]}")
ms, mb = statistics.median(t_small), statistics.median(t_big)
print(f"read+agg many-small-files median {ms:.2f}s  compacted {mb:.2f}s  "
      f"speedup {ms / mb:.2f}x")
spark.stop()
