"""Per-trigger breakdown for the two streaming bench rows: run the query
function, then dump each micro-batch's durationMs and state-operator
metrics from the StreamingQuery progress log (guide §1: measure first).

Usage: python tools/stream_probe.py {ooo|conv} [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sliding_window_aggregators_spark.sources import get_spark  # noqa: E402


def main() -> None:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app="swag-stream-probe")
    from pyspark.sql import functions as F

    from sliding_window_aggregators_spark.plans import events_queries as eq
    from sliding_window_aggregators_spark.streaming.sink import (
        write_stream_exactly_once,
    )

    listener_rows = []

    class _L:
        pass

    # use the query functions' own building blocks so the probe matches
    if which == "ooo":
        from sliding_window_aggregators_spark.streaming.engine import (
            sliding_agg_stream,
        )

        df = eq._events(spark, sf_dir).select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "cents",
        )
        src = eq._cached_events_layout(sf_dir, "ooostream4", lambda tmp: (_ for _ in ()).throw(RuntimeError("layout missing")))
        base = "/tmp/swag_probe_ooo"
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base)
        stream_df = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, cents long"
            )
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        stream = sliding_agg_stream(
            stream_df, key="user_id", ts_col="ts", value_expr="cents",
            monoid_name="sum", duration="1 hour", watermark="1 minute",
            out_col="osum_cents", id_cols=["event_id"], int_values=True,
        )
        q, sink = write_stream_exactly_once(
            stream, os.path.join(base, "out"), os.path.join(base, "ckpt")
        )
    else:
        from sliding_window_aggregators_spark.streaming.engine import (
            conversation_timeout_stream,
        )

        src = eq._cached_events_layout(sf_dir, "timeoutstream2", lambda tmp: (_ for _ in ()).throw(RuntimeError("layout missing")))
        base = "/tmp/swag_probe_conv"
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base)
        for k, v in {
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled": "true",
        }.items():
            spark.conf.set(k, v)
        for kv in os.environ.get("SWAG_PROBE_CONF", "").split(";"):
            if "=" in kv:
                k, _, v = kv.partition("=")
                spark.conf.set(k, v)
                print(f"conf {k}={v}", file=sys.stderr)
        stream_df = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        stream = conversation_timeout_stream(
            stream_df, key="user_id", ts_col="ts", gap="30 minutes",
            watermark="1 minute",
        )
        q, sink = write_stream_exactly_once(
            stream, os.path.join(base, "out"), os.path.join(base, "ckpt")
        )

    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    print(f"drain wall: {wall:.2f}s", file=sys.stderr)
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else p.durationMs
        pj = p if isinstance(p, dict) else json.loads(p.json)
        so = pj.get("stateOperators") or []
        row = {
            "batchId": pj.get("batchId"),
            "numInputRows": pj.get("numInputRows"),
            "durationMs": pj.get("durationMs"),
        }
        if so:
            row["state"] = {
                k: so[0].get(k)
                for k in (
                    "numRowsTotal", "numRowsUpdated", "commitTimeMs",
                    "stateMemory", "numStateStoreInstances",
                )
            }
            row["customMetrics"] = {
                k: v for k, v in (so[0].get("customMetrics") or {}).items()
                if v and v > 100
            }
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
