"""Ops CLI: summarize a streaming checkpoint's state from its files.

    python tools/state_report.py CHECKPOINT_DIR [--duration '1 hour']
        [--operator-id N] [--batch-id N] [--top 10] [--cpus 8]

Prints the checkpoint's stateful-operator lineage (state-metadata), then
for each groupState-blob operator a per-key state summary — key count,
total state rows/bytes, the largest keys — and, with ``--duration``, the
retention-bound audit verdict (every key's retained event-time span must
be ≤ 2·duration; see streaming/state_inspect.py). Runs against a live
job's checkpoint: the state source reads committed batches only."""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--duration", default=None,
                    help="audit the 2x-duration retention bound")
    ap.add_argument("--operator-id", type=int, default=None)
    ap.add_argument("--batch-id", type=int, default=None)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sliding_window_aggregators_spark.sources import get_spark
    from sliding_window_aggregators_spark.streaming import (
        audit_state_bound,
        group_state_stats,
        state_operators,
    )

    spark = get_spark(app="state-report", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    meta = state_operators(spark, args.checkpoint)
    print("== operators ==")
    meta.show(truncate=False)

    import json as _json

    # blob-state operators: (operatorId, state_var) pairs — groupState
    # blobs for applyInPandasWithState, each registered ValueState for
    # transformWithState (variable names from operatorProperties)
    blob_ops = []
    for r in meta.collect():
        if args.operator_id is not None and r["operatorId"] != args.operator_id:
            continue
        if r["operatorName"] == "applyInPandasWithState":
            blob_ops.append((r["operatorId"], None))
        elif r["operatorName"] == "transformWithStateInPandasExec":
            props = _json.loads(r["operatorProperties"] or "{}")
            blob_ops.extend(
                (r["operatorId"], v["stateName"])
                for v in props.get("stateVariables", [])
                if v.get("stateVariableType") == "ValueState"
            )
    rc = 0
    for op, var in blob_ops:
        label = f"operator {op}" + (f" state_var {var!r}" if var else "")
        print(f"== {label}: per-key state ==")
        stats = group_state_stats(
            spark, args.checkpoint, operator_id=op, batch_id=args.batch_id,
            state_var=var,
        ).cache()
        stats.agg(
            F.count("*").alias("keys"),
            F.sum("state_rows").alias("state_rows"),
            F.sum("blob_bytes").alias("state_bytes"),
            F.max("span_us").alias("max_span_us"),
            F.countDistinct("partition_id").alias("partitions_used"),
        ).show(truncate=False)
        print(f"-- top {args.top} keys by state_rows --")
        stats.orderBy(F.desc("state_rows")).show(args.top, truncate=False)
        if args.duration:
            audited = audit_state_bound(
                spark, args.checkpoint, args.duration,
                operator_id=op, batch_id=args.batch_id, state_var=var,
            )
            bad = audited.filter(~F.col("ok"))
            n_bad = bad.count()
            print(f"-- audit (2 x {args.duration}): "
                  f"{'OK' if n_bad == 0 else f'{n_bad} VIOLATIONS'} --")
            if n_bad:
                bad.show(args.top, truncate=False)
                rc = 1
        stats.unpersist()
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
