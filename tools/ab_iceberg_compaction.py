"""Reproducible A/B: Iceberg sink read path before/after rewrite.

Builds a table the way the streaming sink does (one append snapshot
per micro-batch -> many small files), times a full scan + aggregate at
the pre-rewrite snapshot vs after rewrite_data_files, same session,
interleaved x3. Prints one JSON line.

Usage: python tools/ab_iceberg_compaction.py [batches] [rows_per_batch]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    from pyspark.sql import functions as F

    from sliding_window_aggregators_spark.iceberg import (
        IcebergTable, rewrite_data_files)
    from sliding_window_aggregators_spark.sources import get_spark
    from sliding_window_aggregators_spark.sources.transcripts import (
        transcripts_pandas,
    )
    from sliding_window_aggregators_spark.streaming.iceberg_sink import (
        ExactlyOnceIcebergSink,
    )

    spark = get_spark(app="ab-iceberg", cpus=8, shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="ab_icb_")
    loc = os.path.join(root, "tbl")
    pdf = transcripts_pandas(batches * rows, 256)
    sink = ExactlyOnceIcebergSink(loc, partition_spec=[("ts", "hour")],
                                  target_partitions=4)
    for b in range(batches):
        sink(spark.createDataFrame(pdf.iloc[b * rows:(b + 1) * rows]), b)

    t = IcebergTable(loc)
    pre_snap = t.current_snapshot()["snapshot-id"]
    files_before = len(t.plan_files())
    rep = rewrite_data_files(spark, loc, target_partitions=1)
    t.refresh()

    def scan(snapshot_id):
        t0 = time.perf_counter()
        n = (t.read(spark, snapshot_id=snapshot_id)
             .agg(F.count("*"), F.sum(F.length("text"))).collect())
        return time.perf_counter() - t0, n[0][0]

    small_s, big_s = [], []
    for _ in range(3):  # interleaved: window drift hits both arms
        s, n1 = scan(pre_snap)
        c, n2 = scan(None)
        assert n1 == n2 == batches * rows
        small_s.append(s)
        big_s.append(c)
    small, big = min(small_s), min(big_s)
    print(json.dumps({
        "metric": "iceberg_compaction_read_speedup",
        "files_before": files_before, "files_after": rep["files_after"],
        "rows": batches * rows,
        "scan_small_files_sec": round(small, 3),
        "scan_rewritten_sec": round(big, 3),
        "speedup": round(small / big, 2),
        "samples": [list(map(lambda x: round(x, 3), small_s)),
                    list(map(lambda x: round(x, 3), big_s))],
    }))
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
