"""Production launch shape for the streaming engine (north_rule: run via
``spark-submit --py-files`` on a multi-executor cluster).

    zip -r swag_spark.zip sliding_window_aggregators_spark/
    spark-submit \
      --py-files swag_spark.zip \
      --conf spark.sql.shuffle.partitions=2048 \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=1048576 \
      jobs/streaming_job.py \
      --source /warehouse/transcripts --out /warehouse/rollups \
      --checkpoint /checkpoints/rollups --monoid sum --duration "10 minutes"

Reads the transcripts stream (``conv_id string, turn_idx int, role
string, text string, tool string, ts timestamp`` — the BASELINE
input_hint schema), runs the per-turn sliding event-time aggregate
through the FiBA-equivalent ordered state, and writes exactly-once with
per-partition lineage + per-batch metrics. Resumable: re-launching with
the same ``--checkpoint`` continues from the last committed offset and
replayed batches are idempotently skipped by the sink's commit log.

Local smoke (this sandbox): ``python jobs/streaming_job.py --source
<dir-of-parquet> --out /tmp/out --checkpoint /tmp/ckpt --available-now``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _crash_stage(marker: str, kill_executor: bool):
    """Pass-through mapInPandas stage that dies exactly once (atomic
    marker claim) on the first task that sees data: SIGKILL its own
    Python worker, or — ``kill_executor`` — the executor JVM found by
    walking /proc ppid links to the CoarseGrainedExecutorBackend (never
    any other JVM: under local[N] the chain ends at the driver and the
    stage refuses to fire rather than kill the app)."""

    def crash_once(batches):
        import os as _os
        import signal as _signal

        def executor_jvm_pid():
            pid = _os.getpid()
            for _ in range(12):
                try:
                    with open(f"/proc/{pid}/stat") as fh:
                        ppid = int(fh.read().rsplit(")", 1)[1].split()[1])
                    if ppid <= 1:
                        return None
                    with open(f"/proc/{ppid}/cmdline", "rb") as fh:
                        cmd = fh.read().replace(b"\0", b" ").decode(
                            errors="replace")
                except OSError:
                    return None
                if "CoarseGrainedExecutorBackend" in cmd:
                    return ppid
                pid = ppid
            return None

        armed = True
        for pdf in batches:
            if armed:
                armed = False
                target = _os.getpid()
                if kill_executor:
                    target = executor_jvm_pid()
                if target is not None:
                    try:
                        # atomic claim: exactly one task across the whole
                        # job (including its own retry) wins the crash
                        _os.close(_os.open(
                            marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
                        ))
                        _os.kill(target, _signal.SIGKILL)
                        if kill_executor:
                            # the JVM is gone; don't let this orphaned
                            # worker stream rows into a dead socket
                            _os.kill(_os.getpid(), _signal.SIGKILL)
                    except FileExistsError:
                        pass
            yield pdf

    return crash_once


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="stream source directory")
    ap.add_argument("--out", required=True, help="sink directory")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--monoid", default="sum")
    ap.add_argument("--value-expr", default="length(text)")
    ap.add_argument("--duration", default="10 minutes")
    ap.add_argument("--watermark", default="1 minute")
    ap.add_argument("--salt-buckets", type=int, default=0,
                    help="hot-conversation salting for --tumbling mode "
                         "(0 = off; a no-op for the sliding aggregate, "
                         "whose stateful groupBy re-shuffles on the bare "
                         "key — see streaming/engine.py)")
    ap.add_argument("--tumbling", default=None, metavar="SIZE",
                    help="run a tumbling aggregate of this window size "
                         "(e.g. '1 hour') instead of the per-turn sliding "
                         "aggregate; salting applies here")
    ap.add_argument("--panes", default=None, metavar="SIZE",
                    help="run pane-sliced sliding windows of this size at "
                         "--slide granularity (sliding_panes_stream) "
                         "instead of the per-turn sliding aggregate: one "
                         "monoid partial per slide-aligned pane, so per-key "
                         "state is O(size/slide) regardless of the "
                         "conversation's turn rate — the rollup/dashboard "
                         "window shape; emits (conv_id, window_start, "
                         "window_end, wagg) exactly once per closable "
                         "window")
    ap.add_argument("--slide", default="15 minutes",
                    help="pane width / emission granularity for --panes "
                         "(size must be a whole multiple of it)")
    ap.add_argument("--pre-combine", action="store_true",
                    help="--panes only: fold rows into per-(key, pane) "
                         "partials MAP-SIDE before the stateful shuffle "
                         "(the hand-built partial aggregation Catalyst "
                         "can't inject through pandas-state operators) — "
                         "the Zipf-hot key's serial in-state fold drops "
                         "from O(its rows) to O(live panes x upstream "
                         "partitions); commutative monoids only")
    ap.add_argument("--multi-monoids", default=None, metavar="M1,M2,...",
                    help="run the window-shared multi-aggregate sliding "
                         "stream (sliding_agg_stream_multi): every listed "
                         "monoid over every --multi-durations window, ONE "
                         "stateful operator — the streaming analogue of "
                         "the batch scaling study's 5-monoid x 3-window "
                         "protocol job")
    ap.add_argument("--multi-durations",
                    default="2 minutes,10 minutes,60 minutes")
    ap.add_argument("--multi-value-exprs", default=None,
                    metavar="EXPR1;EXPR2;...",
                    help="per-monoid SQL value lifts for --multi-monoids "
                         "(semicolon-separated, one per listed monoid — "
                         "e.g. \"length(text);cast(role='tool' as bigint);"
                         "unix_micros(cast(ts as timestamp))\" for "
                         "sum+maxrun+maxgap); identical expressions dedupe "
                         "to one shuffled column; default = one shared "
                         "'length(text) + 1' for every monoid")
    ap.add_argument("--audit", action="store_true",
                    help="after the drain, run the lineage audit over the "
                         "sink (commit-log contiguity, metrics vs parquet "
                         "footers, orphan batch dirs, compacted segments) "
                         "and print the report")
    ap.add_argument("--audit-state", action="store_true",
                    help="after the drain, recompute the per-key retention "
                         "bound (retained event-time span <= 2 x duration) "
                         "straight from the CHECKPOINT's state files "
                         "(streaming/state_inspect) and print the verdict; "
                         "exit 5 on violation. Applies to the per-turn "
                         "sliding modes (default / --multi-monoids / "
                         "--tws)")
    ap.add_argument("--partition-by", default=None, metavar="NAME:EXPR",
                    help="stamp a partition column NAME = SQL EXPR over "
                         "the aggregate's output rows and write each batch "
                         "hive-partitioned by it (e.g. "
                         "\"day:to_date(ts)\") — sink readers prune by "
                         "the partition instead of scanning every batch")
    ap.add_argument("--compact", type=int, default=None, metavar="KEEP_LAST",
                    help="after the drain, compact the sink's committed "
                         "batch dirs (all but the newest KEEP_LAST) into "
                         "lineage-preserving segments — the small-files "
                         "maintenance pass (Iceberg rewrite_data_files "
                         "equivalent); runs before --audit so the audit "
                         "verifies the compacted layout")
    ap.add_argument("--compact-every", type=int, default=None, metavar="K",
                    help="inline auto-compaction: the sink compacts "
                         "itself after every K-th committed batch "
                         "(commit-count maintenance scheduling, the way "
                         "Iceberg tables schedule rewrite_data_files) — "
                         "live batch-dir count stays bounded on a "
                         "long-running query")
    ap.add_argument("--available-now", action="store_true",
                    help="drain available input then stop (batch-mode run)")
    ap.add_argument("--pin-executors", action="store_true",
                    help="pin each executor JVM (+ descendants) to one "
                         "distinct host core — single-box multi-executor "
                         "emulation where an N-executor level must consume "
                         "exactly N cores (see sources/affinity.py)")
    ap.add_argument("--hot-keys-top", type=int, default=0, metavar="N",
                    help="chunk-halo decomposition for the N hottest "
                         "conversations (discovered by a batch pre-read of "
                         "--source): each hot key's sliding state spreads "
                         "over one group per elapsed --chunk-span instead "
                         "of one serial straggler group "
                         "(streaming/engine.py _with_time_chunk_halo)")
    ap.add_argument("--chunk-span", default="96 hours",
                    help="event-time span of one hot-key chunk; must be "
                         ">= the longest window duration")
    ap.add_argument("--emit-filter", default=None, metavar="SQL_EXPR",
                    help="state-only row predicate for zero-duplicate "
                         "RE-PLANS (sliding modes): rows where the "
                         "expression is false/null warm window state but "
                         "never emit. Recipe: after draining the old plan, "
                         "relaunch with a FRESH --checkpoint/--out over "
                         "the full source and --emit-filter matching only "
                         "not-yet-emitted rows (e.g. "
                         "\"input_file_name() like '%/new_chunk/%'\"); "
                         "old-sink UNION new-sink equals the uninterrupted "
                         "run (streaming/engine.py emit_filter)")
    ap.add_argument("--fault-inject", default=None, metavar="MARKER_PATH",
                    help="chaos drill: SIGKILL one Python worker mid-task, "
                         "exactly once per marker file (created atomically "
                         "at MARKER_PATH on the first task that reads "
                         "data). Run under a master with task retries "
                         "(e.g. local[4,2] or any real cluster) and the "
                         "retried task must leave the sink exactly-once — "
                         "the DR drill for the north rule's exactly-once "
                         "claim. Refuses to run when spark.task.maxFailures "
                         "is 1 (the injected kill would just fail the job)")
    ap.add_argument("--tws", action="store_true",
                    help="run the sliding aggregate through Spark 4's "
                         "transformWithStateInPandas (production "
                         "arbitrary-state API, RocksDB state store, "
                         "timer-based chunk expiry) instead of "
                         "applyInPandasWithState — identical semantics, "
                         "the reference contract that the OOO state must "
                         "execute under the production API")
    ap.add_argument("--max-files-per-trigger", type=int, default=0,
                    metavar="N",
                    help="micro-batch rate limit (readStream "
                         "maxFilesPerTrigger; 0 = Spark default). "
                         "availableNow honors it, so a chunked source "
                         "drains as many small batches — the soak/replay "
                         "cadence — instead of one giant one")
    ap.add_argument("--fault-inject-executor", default=None,
                    metavar="MARKER_PATH",
                    help="chaos drill: SIGKILL one ENTIRE executor JVM "
                         "mid-task (node-loss emulation), exactly once "
                         "per marker file. Needs separate executor JVMs "
                         "(local-cluster[2,1,1024] or a real cluster); "
                         "the scheduler must reschedule onto survivors, "
                         "reload state from the checkpoint, and the sink "
                         "must stay exactly-once")
    ap.add_argument("--fault-inject-sink", default=None,
                    metavar="MARKER_PATH",
                    help="chaos drill: kill the DRIVER (os._exit) after a "
                         "batch's parquet write but before its commit "
                         "marker, once per marker file — the worst-case "
                         "crash window. Relaunch with the same "
                         "--checkpoint: the replayed batch must be "
                         "rewritten idempotently (exactly-once, audit ok)")
    ap.add_argument("--source-format", choices=("parquet-dir", "iceberg"),
                    default="parquet-dir",
                    help="'iceberg': --source is a jar-less Iceberg table "
                         "(sliding_window_aggregators_spark.iceberg); the "
                         "current snapshot's planned files are symlinked "
                         "into <checkpoint>/_iceberg_links and tailed by "
                         "the file stream source — offsets stay "
                         "checkpoint-resumable, later snapshots are picked "
                         "up by re-launch (north rule: ingest the Iceberg "
                         "transcripts table as a stream)")
    ap.add_argument("--sink-format", choices=("parquet-dir", "iceberg"),
                    default="parquet-dir",
                    help="'iceberg': commit each micro-batch as one "
                         "Iceberg append snapshot with the batch id in "
                         "the snapshot summary (idempotent replay = "
                         "exactly-once); the table's atomic metadata swap "
                         "is the commit log, so this survives driver "
                         "failover on shared storage")
    ap.add_argument("--iceberg-partition", default=None,
                    metavar="COL:TRANSFORM,...",
                    help="Iceberg sink partition spec, e.g. "
                         "'conv_id:bucket[16],ts:hour' (identity/hour/"
                         "bucket[N] per the Iceberg spec)")
    ap.add_argument("--iceberg-maintain", type=int, default=None,
                    metavar="KEEP_SNAPSHOTS",
                    help="post-drain maintenance for --sink-format "
                         "iceberg: rewrite_data_files (one REPLACE "
                         "snapshot compacting the per-batch small "
                         "files) then expire_snapshots keeping the "
                         "last KEEP_SNAPSHOTS — the Iceberg twin of "
                         "--compact's write->compact->expire lifecycle")
    ap.add_argument("--combine-sink", action="store_true",
                    help="fold each micro-batch's per-turn results to one "
                         "row (count + per-column sums) before the "
                         "exactly-once commit — the reference benchmark's "
                         "sink discipline (silly_combine accumulates every "
                         "query() result, cpp/src/benchmark_core.h:28-42) "
                         "for scaling studies; production rollups keep the "
                         "full per-turn write")
    args = ap.parse_args()
    if args.tws and (args.tumbling or args.multi_monoids):
        ap.error("--tws runs the single-monoid sliding aggregate; it "
                 "composes with --monoid/--duration/--hot-keys-top, not "
                 "with --tumbling/--multi-monoids")
    if args.panes and (args.tumbling or args.tws):
        ap.error("--panes is the pane-sliced rollup mode; it composes with "
                 "--monoid/--value-expr/--slide (and with --multi-monoids/"
                 "--multi-durations for shared-pane multi-aggregates), not "
                 "with --tumbling/--tws")
    if args.panes and (args.hot_keys_top or args.emit_filter):
        ap.error("--panes state is already bounded per key (one partial "
                 "per pane) and emits per WINDOW, not per row — "
                 "--hot-keys-top/--emit-filter apply to the per-turn "
                 "sliding modes")
    if args.multi_value_exprs and not args.multi_monoids:
        ap.error("--multi-value-exprs requires --multi-monoids (the "
                 "single-monoid path takes --value-expr); refusing to "
                 "silently ignore it")
    if args.audit_state and (args.tumbling or args.panes):
        ap.error("--audit-state recomputes the ordered-state 2x-duration "
                 "bound; --tumbling/--panes keep state in other layouts "
                 "(native window rows / pane partials, whose bound is a "
                 "pane count, not a time span) — inspect those with "
                 "tools/state_report.py instead")
    if args.pre_combine and not args.panes:
        ap.error("--pre-combine is the map-side pane partial-aggregation "
                 "path; it requires --panes (the per-turn sliding modes "
                 "emit one row per TURN, which is not decomposable "
                 "map-side)")
    if args.sink_format == "iceberg" and (
            args.compact is not None or args.compact_every is not None
            or args.partition_by or args.combine_sink
            or args.fault_inject_sink):
        ap.error("--compact/--compact-every/--partition-by/--combine-sink/"
                 "--fault-inject-sink belong to the parquet-dir sink; the "
                 "Iceberg sink partitions via --iceberg-partition, "
                 "compacts via its own file layout, and drills crashes "
                 "through iceberg.writer's fault_before_commit")
    if args.iceberg_partition and args.sink_format != "iceberg":
        ap.error("--iceberg-partition requires --sink-format iceberg")
    if args.iceberg_maintain is not None and args.sink_format != "iceberg":
        ap.error("--iceberg-maintain requires --sink-format iceberg "
                 "(the parquet-dir sink maintains via --compact)")
    if args.iceberg_maintain is not None and args.iceberg_maintain < 1:
        ap.error("--iceberg-maintain must keep >= 1 snapshot (the "
                 "current one can never be expired)")

    from pyspark.sql import SparkSession

    from sliding_window_aggregators_spark.sources.session import _ship_package
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream,
        sliding_agg_stream_multi,
        tumbling_stream,
        tumbling_stream_salted,
        write_stream_exactly_once,
    )

    # under spark-submit the session/master/executors come from the
    # launcher; getOrCreate attaches to it (local runs get local[*])
    spark = SparkSession.builder.appName("swag-streaming-job").getOrCreate()
    _ship_package(spark)

    if args.pin_executors:
        from sliding_window_aggregators_spark.sources.affinity import (
            pin_executors,
        )

        # a JVM-only action forces full executor registration (the bench
        # launch sets minRegisteredResourcesRatio=1.0) before pinning;
        # python daemons fork later inside the stream and inherit the mask
        spark.range(1 << 20).repartition(64).count()
        print(f"pinned executors: {pin_executors(spark)}", file=sys.stderr)

    hot_keys = None
    if args.hot_keys_top:
        # hot-key discovery: the engine's side-job helper (one batch
        # aggregation over the source; the grouping expression must be
        # fixed at query start, so the list is a plan-time input)
        import time as _time

        from sliding_window_aggregators_spark.streaming import (
            discover_hot_keys,
        )

        t_hot = _time.perf_counter()
        if args.source_format == "iceberg":
            from sliding_window_aggregators_spark.iceberg import (
                IcebergTable,
            )

            hot_src = IcebergTable(args.source).read(spark)
        else:
            hot_src = spark.read.option(
                "pathGlobFilter", "*.parquet"
            ).parquet(os.path.join(args.source, "*"))
        hot_keys = discover_hot_keys(
            hot_src,
            key="conv_id",
            top_n=args.hot_keys_top,
        )
        print(
            f"hot-key discovery seconds: {_time.perf_counter() - t_hot:.3f} "
            f"({len(hot_keys)} keys)",
            file=sys.stderr,
        )

    if args.source_format == "iceberg":
        from sliding_window_aggregators_spark.iceberg.source import (
            stream_from_iceberg,
        )

        stream = stream_from_iceberg(
            spark, args.source,
            os.path.join(args.checkpoint, "_iceberg_links"),
            max_files_per_trigger=args.max_files_per_trigger,
            columns=tuple(
                c.split()[0] for c in TRANSCRIPTS_SCHEMA.split(", ")
            ),
        )
    else:
        # glob one level so both flat files and per-arrival chunk
        # directories under the source root are picked up
        reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA).option(
            "pathGlobFilter", "*.parquet"
        )
        if args.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", args.max_files_per_trigger
            )
        stream = reader.parquet(os.path.join(args.source, "*"))
    if args.fault_inject and args.fault_inject_executor:
        ap.error("--fault-inject and --fault-inject-executor are separate "
                 "drills; run one at a time")
    if args.fault_inject:
        import re

        # the kill only proves anything if the scheduler retries the task:
        # plain local[N] has maxFailures=1 and the drill would merely crash
        # the job, so refuse loudly (local[N,F] encodes F in the master
        # string; every other master reads spark.task.maxFailures, def. 4)
        master = spark.sparkContext.master
        m = re.match(r"local\[([^\]]+)\]$", master)
        if m:
            parts = [p.strip() for p in m.group(1).split(",")]
            retries = int(parts[1]) if len(parts) > 1 else 1
        else:
            retries = int(spark.conf.get("spark.task.maxFailures", "4"))
        if retries <= 1:
            print(
                f"--fault-inject needs task retries; master {master!r} has "
                "spark.task.maxFailures=1 (use e.g. local[4,2])",
                file=sys.stderr,
            )
            sys.exit(4)
        stream = stream.mapInPandas(
            _crash_stage(args.fault_inject, kill_executor=False),
            stream.schema,
        )
    if args.fault_inject_executor:
        # node-loss drill: needs REAL executor JVMs that are not the
        # driver (killing the chain's JVM under local[N] would be the
        # driver = the whole app) and >1 of them so the reschedule has
        # somewhere to land while the standalone master replaces the dead
        # one. The in-worker killer additionally refuses to signal any
        # JVM that is not a CoarseGrainedExecutorBackend.
        master = spark.sparkContext.master
        if not (master.startswith("local-cluster")
                or master.startswith("spark://")):
            print(
                "--fault-inject-executor needs separate executor JVMs "
                f"(local-cluster[...] or spark://), not {master!r}",
                file=sys.stderr,
            )
            sys.exit(4)
        stream = stream.mapInPandas(
            _crash_stage(args.fault_inject_executor, kill_executor=True),
            stream.schema,
        )
    if args.tumbling:
        # distributive tumbling aggregate — the mode where salting is real
        if args.salt_buckets:
            agg = tumbling_stream_salted(
                stream, size=args.tumbling, value_expr=args.value_expr,
                watermark=args.watermark, buckets=args.salt_buckets,
            )
        else:
            agg = tumbling_stream(
                stream, size=args.tumbling, value_expr=args.value_expr,
                watermark=args.watermark,
            )
    elif args.panes:
        from sliding_window_aggregators_spark.streaming import (
            sliding_panes_stream,
            sliding_panes_stream_multi,
        )

        drop_acc = spark.sparkContext.accumulator(0)
        if args.multi_monoids:
            # shared-pane multi-aggregate rollup: N monoids x K sizes
            # (--panes plus extra sizes from --multi-durations) over one
            # pane layer per key
            sizes = [args.panes] + [
                d.strip() for d in args.multi_durations.split(",")
                if d.strip() and d.strip() != args.panes
            ]
            agg = sliding_panes_stream_multi(
                stream,
                monoids=tuple(args.multi_monoids.split(",")),
                sizes=tuple(sizes),
                slide=args.slide,
                value_expr=args.value_expr,
                value_exprs=(
                    tuple(e.strip()
                          for e in args.multi_value_exprs.split(";"))
                    if args.multi_value_exprs else None
                ),
                watermark=args.watermark,
                pre_combine=args.pre_combine,
                dropped_late_counter=drop_acc,
            )
        else:
            agg = sliding_panes_stream(
                stream,
                monoid_name=args.monoid,
                value_expr=args.value_expr,
                size=args.panes,
                slide=args.slide,
                watermark=args.watermark,
                out_col="wagg",
                pre_combine=args.pre_combine,
                dropped_late_counter=drop_acc,
            )
    elif args.tws:
        from sliding_window_aggregators_spark.streaming import (
            sliding_agg_stream_tws,
        )

        # the production arbitrary-state API wants the production state
        # store; set it before the stream is planned
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        agg = sliding_agg_stream_tws(
            stream,
            monoid_name=args.monoid,
            value_expr=args.value_expr,
            duration=args.duration,
            watermark=args.watermark,
            out_col="wagg",
            hot_keys=hot_keys,
            chunk_span=args.chunk_span if hot_keys else None,
            emit_filter=args.emit_filter,
        )
    elif args.multi_monoids:
        agg = sliding_agg_stream_multi(
            stream,
            monoids=tuple(args.multi_monoids.split(",")),
            durations=tuple(
                d.strip() for d in args.multi_durations.split(",")
            ),
            # +1 keeps geomean's log-lift off zero-length turns; one shared
            # value column for every monoid x window (window sharing)
            # unless --multi-value-exprs supplies per-monoid lifts
            value_expr="length(text) + 1",
            value_exprs=(
                tuple(e.strip() for e in args.multi_value_exprs.split(";"))
                if args.multi_value_exprs else None
            ),
            watermark=args.watermark,
            int_values=True,
            hot_keys=hot_keys,
            chunk_span=args.chunk_span if hot_keys else None,
            emit_filter=args.emit_filter,
        )
    else:
        # operational late-data metric: rows the per-key admission rule
        # rejected (stricter than Spark's global numRowsDroppedByWatermark)
        drop_acc = spark.sparkContext.accumulator(0)
        agg = sliding_agg_stream(
            stream,
            monoid_name=args.monoid,
            value_expr=args.value_expr,
            duration=args.duration,
            watermark=args.watermark,
            out_col="wagg",
            hot_keys=hot_keys,
            chunk_span=args.chunk_span if hot_keys else None,
            dropped_late_counter=drop_acc,
            emit_filter=args.emit_filter,
        )
    import time

    part_cols = ()
    if args.partition_by:
        from pyspark.sql import functions as F

        name, expr = args.partition_by.split(":", 1)
        agg = agg.withColumn(name, F.expr(expr))
        part_cols = (name,)
    t0 = time.perf_counter()
    if args.combine_sink:
        from pyspark.sql import functions as F

        from sliding_window_aggregators_spark.streaming import (
            ExactlyOnceParquetSink,
        )

        sink = ExactlyOnceParquetSink(args.out)

        def fold_and_commit(df, batch_id):
            num = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("long", "double", "integer")
            ]
            folded = df.agg(
                F.count(F.lit(1)).alias("rows"),
                *[F.sum(c).alias(f"sum_{c}") for c in num],
            )
            sink(folded, batch_id)

        writer = (
            agg.writeStream.outputMode("append")
            .foreachBatch(fold_and_commit)
            .option("checkpointLocation", args.checkpoint)
        )
        if args.available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
    elif args.sink_format == "iceberg":
        from sliding_window_aggregators_spark.streaming.iceberg_sink import (
            write_stream_exactly_once_iceberg,
        )

        pspec = tuple(
            tuple(p.split(":", 1))
            for p in (args.iceberg_partition or "").split(",")
            if p
        )
        q, sink = write_stream_exactly_once_iceberg(
            agg, args.out, args.checkpoint,
            available_now=args.available_now,
            partition_spec=pspec,
        )
    else:
        q, sink = write_stream_exactly_once(
            agg, args.out, args.checkpoint,
            available_now=args.available_now,
            fault_after_write=args.fault_inject_sink,
            partition_by=part_cols,
            compact_every=args.compact_every,
        )
    q.awaitTermination()
    # drain wall time EXCLUDING session/JVM boot (measured from query
    # construction) — what bench_scaling_stream.py parses for the N vs 4N
    # streaming efficiency pair
    print(f"drain seconds: {time.perf_counter() - t0:.3f}", file=sys.stderr)
    print(f"committed batches: {sink.committed_batches()}", file=sys.stderr)
    if not args.tumbling and not args.tws and (
        not args.multi_monoids or args.panes
    ):
        print(f"dropped late rows: {drop_acc.value}", file=sys.stderr)
    if args.compact is not None:
        import json as _json

        from sliding_window_aggregators_spark.streaming import compact_sink

        crep = compact_sink(args.out, keep_last=args.compact)
        crep["segment"] = list(crep["segment"]) if crep["segment"] else None
        print("compaction: " + _json.dumps(crep), file=sys.stderr)
    if args.iceberg_maintain is not None:
        import json as _json

        from sliding_window_aggregators_spark.iceberg import (
            expire_snapshots,
            rewrite_data_files,
        )

        mrep = rewrite_data_files(spark, args.out)
        mrep["expire"] = expire_snapshots(
            args.out, keep_last=args.iceberg_maintain)
        print("iceberg maintenance: " + _json.dumps(mrep),
              file=sys.stderr)
    if args.audit:
        import json as _json

        if args.sink_format == "iceberg":
            from sliding_window_aggregators_spark.streaming.iceberg_sink \
                import audit_iceberg_sink

            report = audit_iceberg_sink(args.out)
        else:
            from sliding_window_aggregators_spark.streaming import (
                audit_sink,
            )

            report = audit_sink(args.out)
        print("lineage audit: " + _json.dumps(report), file=sys.stderr)
        if not report["ok"]:
            sys.exit(3)
    if args.audit_state:
        from sliding_window_aggregators_spark.streaming import (
            assert_state_bounded,
        )

        if args.multi_monoids:
            from sliding_window_aggregators_spark.streaming.engine import (
                _interval_us,
            )

            # multi blobs share one span across durations: bound by the max
            dur = max(
                (d.strip() for d in args.multi_durations.split(",")),
                key=_interval_us,
            )
        else:
            dur = args.duration
        try:
            n = assert_state_bounded(
                spark, args.checkpoint, dur,
                state_var="ordered" if args.tws else None,
            )
            print(f"state audit: OK ({n} keys within 2 x {dur})",
                  file=sys.stderr)
        except AssertionError as exc:
            print(f"state audit: FAIL {exc}", file=sys.stderr)
            sys.exit(5)
    # per-batch duration breakdown (planning vs execution vs offset/WAL
    # commits vs state-store commit) so a scaling study can tell engine
    # work from fixed micro-batch machinery — one compact JSON line
    try:
        import json as _json

        batches = []
        for p in q.recentProgress:
            p = _json.loads(p.json) if hasattr(p, "json") else p
            rec = {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs", {}),
            }
            ops = p.get("stateOperators") or []
            if ops:
                rec["stateCommitMs"] = sum(
                    o.get("commitTimeMs", 0) for o in ops
                )
                # state-size observability: rows/memory per stateful
                # operator — the signal that bounds checkpoint growth
                # (per-key state is O(rows in 2x duration); a monotonic
                # climb here means expired chunks/keys are not clearing)
                rec["stateRows"] = sum(
                    o.get("numRowsTotal", 0) for o in ops
                )
                rec["stateMemoryBytes"] = sum(
                    o.get("memoryUsedBytes", 0) for o in ops
                )
            batches.append(rec)
        print("batch progress: " + _json.dumps(batches), file=sys.stderr)
    except Exception as exc:  # diagnostics must never fail the job
        print(f"batch progress unavailable: {exc!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
