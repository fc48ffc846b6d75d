"""Exactly-once sink with per-partition lineage and metrics.

``foreachBatch`` + checkpointing gives at-least-once batch replay; the
sink makes it exactly-once by *idempotent batch commits*: every batch is
written to ``batch_id=<id>/`` with an atomic ``_COMMIT_<id>`` marker in a
commit log. A replayed batch id (after checkpoint-resume) detects its
marker and skips the write — the standard transactional-sink recipe the
Iceberg writer implements natively (this sink is the Iceberg-less
stand-in; swap ``_write_parquet`` for ``df.writeTo(table).append()``
under an Iceberg catalog and the commit log is Iceberg's snapshot).

Lineage columns stamped on every row: ``_batch_id``,
``_partition_id`` (``spark_partition_id()``), ``_commit_ts`` unset here —
deterministic outputs only carry batch/partition. Metrics (rows,
partitions) go to ``<dir>/_metrics/batch_<id>.json``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str, fault_after_write: str | None = None,
                 partition_by: tuple = (), compact_every: int | None = None,
                 compact_keep_last: int = 1):
        # inline maintenance: every ``compact_every``-th committed batch
        # triggers compact_sink right after its commit marker lands (the
        # way Iceberg tables schedule rewrite_data_files off commit
        # count). Driver-side and brief next to a micro-batch; crash-safe
        # like any compaction — a query killed mid-rewrite resumes with
        # the batch already committed and the next tick (or a manual
        # --compact) finishes cleanup. keep_last >= 1 keeps the rewrite
        # strictly behind the live commit frontier.
        if compact_every is not None and compact_keep_last < 1:
            raise ValueError("compact_keep_last must be >= 1 when "
                             "auto-compaction is on")
        self.compact_every = compact_every
        self.compact_keep_last = compact_keep_last
        # hive-style partition columns INSIDE each batch dir
        # (batch_id=N/day=D/part-*.parquet): at 10^12 turns the sink's
        # readers prune by event-time date instead of scanning every
        # batch — the same reason the warehouse tables partition. The
        # columns must exist on the emitted rows (stamp e.g.
        # to_date(window_end) upstream); lineage metrics, audit and
        # compaction all key files by their batch-relative path, so the
        # whole maintenance story is partition-transparent.
        self.partition_by = tuple(partition_by)
        # DR-drill hook (jobs/streaming_job.py --fault-inject-sink): kill
        # the DRIVER at the worst-case point — after the batch's parquet
        # write, before its commit marker — exactly once per marker path.
        # A relaunch from the same checkpoint replays the batch, finds no
        # _COMMIT_ marker, and must overwrite the orphan dir idempotently;
        # that replay path is the sink's whole exactly-once argument, so
        # it gets a kill switch to prove it under test.
        self.fault_after_write = fault_after_write
        # the commit log and metrics use the DRIVER-LOCAL filesystem; that
        # is only exactly-once when the driver sees the same durable fs the
        # executors write to (local mode, NFS mount). A URI-schemed path
        # (s3://, hdfs://) means it isn't — refuse loudly instead of
        # silently re-writing every replayed batch after a driver failover
        # (the Iceberg writer this sink stands in for commits through the
        # table format instead and has no such boundary).
        if "://" in out_dir:
            raise ValueError(
                "ExactlyOnceParquetSink's commit log is driver-local; for "
                f"remote storage ({out_dir!r}) use the Iceberg writer "
                "(df.writeTo(table).append()) this sink stands in for"
            )
        self.out_dir = out_dir
        self.commit_dir = os.path.join(out_dir, "_commits")
        self.metrics_dir = os.path.join(out_dir, "_metrics")
        os.makedirs(self.commit_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, f"_COMMIT_{batch_id}")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # replayed batch after checkpoint-resume: idempotent skip
        stamped = df.withColumn("_batch_id", F.lit(batch_id)).withColumn(
            "_partition_id", F.spark_partition_id()
        )
        path = os.path.join(self.out_dir, f"batch_id={batch_id}")
        writer = stamped.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(path)
        if self.fault_after_write is not None:
            try:
                os.close(os.open(
                    self.fault_after_write,
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                ))
                # data written, marker NOT — the crash window the commit
                # log exists for; os._exit skips every finally/atexit,
                # the closest a test can get to a driver power cut
                os._exit(70)
            except FileExistsError:
                pass
        # row count from the written files' parquet footers — zero extra
        # Spark jobs (a .count() here would re-execute the whole micro-batch
        # plan a second time, and for a nondeterministic upstream could even
        # disagree with what was written)
        per_file = _footer_row_counts(path)
        with open(
            os.path.join(self.metrics_dir, f"batch_{batch_id}.json"), "w"
        ) as fh:
            json.dump(
                {
                    "batch_id": batch_id,
                    "rows": sum(per_file.values()),
                    # per-partition lineage: one parquet file per write
                    # partition; rows-per-file from the footers (no extra
                    # Spark job), keyed by file name so a reader can join
                    # back to the _partition_id column stamped on the rows
                    "partitions": len(per_file),
                    "rows_per_file": per_file,
                },
                fh,
            )
        # atomic commit marker: the write is visible only once this exists
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("ok")
        os.rename(tmp, self._marker(batch_id))
        if (
            self.compact_every
            and batch_id > 0
            and batch_id % self.compact_every == 0
        ):
            compact_sink(self.out_dir, keep_last=self.compact_keep_last)

    def committed_batches(self) -> list[int]:
        return sorted(
            int(f.rsplit("_", 1)[1])
            for f in os.listdir(self.commit_dir)
            if f.startswith("_COMMIT_") and not f.endswith(".tmp")
        )

    def read_committed(self, spark) -> DataFrame:
        """Every committed row, exactly once: compacted segments stand in
        for the batch ids they cover (a covered ``batch_id=`` dir still on
        disk is pending cleanup from a crash mid-compaction — skipped here,
        so a crash between the segment commit marker and the old-dir
        removal can never double-read)."""
        expired = _expired_upto(self.out_dir)
        ids = self.committed_batches()
        segs = [s for s in _committed_segments(self.out_dir)
                if s[1] > expired]
        covered = {b for lo, hi in segs for b in range(lo, hi + 1)}
        paths = [
            os.path.join(self.out_dir, f"segment={lo}-{hi}")
            for lo, hi in segs
        ] + [
            os.path.join(self.out_dir, f"batch_id={b}")
            for b in ids
            if b not in covered and b > expired
        ]
        # A zero-row committed batch (e.g. the no-data watermark-advance
        # micro-batch an availableNow drain appends) under partition_by
        # writes NO part files, so its dir would break schema inference.
        # Zero parquet files == zero rows: skipping the dir reads the
        # same committed rows exactly once.
        paths = [p for p in paths if _parquet_files_rel(p)]
        if not paths:
            return None
        try:
            return spark.read.parquet(*paths)
        except Exception:
            # partition_by sinks: each root nests hive subdirs, and
            # Spark's multi-path partition discovery refuses conflicting
            # roots — read per root (partition columns inferred per dir)
            # and union. Plan size grows with the dir count, which is
            # exactly what compaction keeps small.
            dfs = [spark.read.parquet(p) for p in paths]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out


def _parquet_files_rel(root: str) -> list[str]:
    """Relative paths of every parquet file under ``root`` (recursive:
    a partitioned batch dir nests hive-style subdirs). Flat layouts
    yield bare file names, so pre-partitioning metrics stay valid."""
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def _footer_row_counts(path: str) -> dict:
    """num_rows per parquet file under ``path``, from the footers."""
    import pyarrow.parquet as pq

    return {
        rel: pq.ParquetFile(os.path.join(path, rel)).metadata.num_rows
        for rel in _parquet_files_rel(path)
    }


def _footer_row_count(path: str) -> int:
    """Sum of num_rows from the parquet footers under ``path``."""
    return sum(_footer_row_counts(path).values())


def _committed_segments(out_dir: str) -> list[tuple[int, int]]:
    """(lo, hi) ranges with a ``_COMPACT_<lo>_<hi>`` commit marker."""
    commit_dir = os.path.join(out_dir, "_commits")
    if not os.path.isdir(commit_dir):
        return []
    segs = []
    for f in os.listdir(commit_dir):
        if f.startswith("_COMPACT_") and not f.endswith(".tmp"):
            lo, hi = f[len("_COMPACT_"):].split("_")
            segs.append((int(lo), int(hi)))
    return sorted(segs)


def _expired_upto(out_dir: str) -> int:
    """Highest batch id covered by an ``_EXPIRE_<hi>`` retention marker
    (-1 when nothing has been expired)."""
    commit_dir = os.path.join(out_dir, "_commits")
    if not os.path.isdir(commit_dir):
        return -1
    his = [
        int(f[len("_EXPIRE_"):])
        for f in os.listdir(commit_dir)
        if f.startswith("_EXPIRE_") and not f.endswith(".tmp")
    ]
    return max(his, default=-1)


def expire_sink(out_dir: str, upto: int) -> dict:
    """Retention for an :class:`ExactlyOnceParquetSink` dir — the third
    lifecycle stage (write → compact → EXPIRE): at 10^12 turns the sink
    cannot keep every batch forever; old data must leave as cheap
    directory drops (Iceberg's ``expireSnapshots`` + data-file GC for
    the stand-in sink).

    Expiry happens at SEGMENT granularity: every batch id in
    ``[0, upto]`` must be covered by compacted segments that lie
    entirely within the range (compact first; pick ``upto`` on a
    segment boundary — the error message names the boundary). The
    procedure is crash-safe the same way compaction is: an atomic
    ``_EXPIRE_<upto>`` marker commits the expiry FIRST, then the covered
    segment dirs + their metrics drop; a crash in between leaves
    segments the audit flags as pending-expiry NOTEs and the next call
    (any ``upto``) finishes removing. The per-batch ``_COMMIT_`` markers
    are never removed (bytes-cheap; they keep the writer's replay-skip
    and the audit's contiguity evidence intact across retention).
    ``read_committed`` and :func:`audit_sink` skip expired ids, so the
    visible row set shrinks by exactly the expired segments.
    """
    prev = _expired_upto(out_dir)
    segs = _committed_segments(out_dir)
    sink = ExactlyOnceParquetSink(out_dir)
    removed, rows_removed = [], 0

    def _drop_upto(bound: int) -> None:
        nonlocal rows_removed
        for lo, hi in segs:
            if hi <= bound:
                sdir = os.path.join(out_dir, f"segment={lo}-{hi}")
                if os.path.isdir(sdir):
                    rows_removed += _footer_row_count(sdir)
                    _rmtree(sdir)
                    removed.append(f"segment={lo}-{hi}")
                mfile = os.path.join(
                    out_dir, "_metrics", f"segment_{lo}_{hi}.json")
                if os.path.exists(mfile):
                    os.remove(mfile)

    # idempotent finish of a crash-interrupted previous expiry
    _drop_upto(prev)
    if upto <= prev:
        return {"expired_upto": prev, "removed_segments": removed,
                "rows_removed": rows_removed}

    covered = sorted(
        b for lo, hi in segs for b in range(lo, hi + 1) if b <= upto)
    want = [b for b in sink.committed_batches() if b <= upto]
    if covered != want or any(lo <= upto < hi for lo, hi in segs):
        boundaries = [hi for _, hi in segs]
        raise ValueError(
            f"expire upto={upto} must cover whole compacted segments: "
            f"compact first, then pick a segment boundary from "
            f"{boundaries}"
        )
    tmp = os.path.join(out_dir, "_commits", f"_EXPIRE_{upto}.tmp")
    with open(tmp, "w") as fh:
        fh.write("ok")
    os.rename(tmp, tmp[: -len(".tmp")])  # the commit point
    _drop_upto(upto)
    return {"expired_upto": upto, "removed_segments": removed,
            "rows_removed": rows_removed}


def compact_sink(
    out_dir: str,
    *,
    keep_last: int = 1,
    min_batches: int = 2,
    target_rows_per_file: int = 4_000_000,
    compression: str = "zstd",
    sort_by: tuple = (),
    _fault_after_marker: bool = False,
) -> dict:
    """Small-file compaction for an :class:`ExactlyOnceParquetSink` dir —
    the maintenance job a micro-batch sink needs at scale (each trigger
    writes one dir of small files; at 10^12 turns that is millions of
    files and the metadata, open() and footer costs dominate reads). The
    Iceberg writer this sink stands in for does this natively
    (``rewrite_data_files``); this is the stand-in's equivalent, and like
    Iceberg's it is safe to crash anywhere:

    1. finish any cleanup a previous crashed compaction left behind
       (covered ``batch_id=`` dirs + their per-batch metrics files), and
       remove orphan segment dirs that never got their commit marker;
    2. pick the contiguous run of committed, not-yet-covered batch ids,
       excluding the newest ``keep_last`` (the ids an active writer's
       replay window may still inspect with human eyes — the commit
       markers themselves are NEVER removed, so writer replay-skips keep
       working for compacted ids too);
    3. stream the run's parquet files into ``segment=<lo>-<hi>/`` (rows
       keep their ``_batch_id`` / ``_partition_id`` lineage columns;
       files roll at ``target_rows_per_file``; recompressed to
       ``compression`` — zstd by default, the standard cold-data rewrite
       trade of write-once CPU for storage footprint and read IO),
       publish the dir with an atomic rename, write segment metrics
       (per-file footer counts + per-BATCH row counts — the lineage
       audit_sink re-verifies), then commit with an atomic
       ``_COMPACT_<lo>_<hi>`` marker;
    4. remove the covered per-batch dirs and metrics files.

    ``sort_by=("conv_id", "ts")`` additionally CLUSTERS each segment
    (per partition subdir) on the given columns before writing —
    Iceberg's sort rewrite: globally sorted rows make the parquet
    min/max statistics selective, so a point/range read over the sort
    key skips whole files and row groups instead of scanning the
    segment. Costs memory proportional to the largest partition subdir
    of the segment (the rows must be materialized to sort), so size
    segments accordingly; the unsorted path stays streaming.

    A crash before step 3's marker leaves an orphan segment dir (flagged
    by :func:`audit_sink`, removed and redone by the next run); a crash
    after it leaves covered batch dirs pending cleanup (a NOTE in the
    audit, never a double-read — ``read_committed`` prefers segments).
    Run it with the query stopped or between triggers, like any Iceberg
    maintenance job. Pure pyarrow, zero Spark jobs: the sink is already
    declared driver-local-filesystem-only.

    Returns ``{"segment": (lo, hi) | None, "rows": n, "files_before": b,
    "files_after": a, "cleaned": [...]}."``
    """
    import pyarrow.parquet as pq

    commit_dir = os.path.join(out_dir, "_commits")
    metrics_dir = os.path.join(out_dir, "_metrics")
    sink = ExactlyOnceParquetSink(out_dir)
    ids = sink.committed_batches()
    segs = _committed_segments(out_dir)
    covered = {b for lo, hi in segs for b in range(lo, hi + 1)}

    cleaned: list[str] = []
    # step 1a: idempotent finish of a crash-after-marker compaction
    for b in sorted(covered):
        bdir = os.path.join(out_dir, f"batch_id={b}")
        if os.path.isdir(bdir):
            _rmtree(bdir)
            cleaned.append(f"batch_id={b}")
        mfile = os.path.join(metrics_dir, f"batch_{b}.json")
        if os.path.exists(mfile):
            os.remove(mfile)
    # step 1b: orphan segments (crash before marker) are uncommitted
    committed_names = {f"segment={lo}-{hi}" for lo, hi in segs}
    for name in os.listdir(out_dir):
        if name.startswith("segment=") and name not in committed_names:
            _rmtree(os.path.join(out_dir, name))
            cleaned.append(name)

    # step 2: the candidate run — contiguous uncovered ids, oldest first
    candidates = [b for b in ids if b not in covered]
    if keep_last > 0:
        candidates = candidates[: len(candidates) - keep_last]
    run: list[int] = []
    for b in candidates:
        if run and b != run[-1] + 1:
            break  # compact only the first contiguous run per call
        run.append(b)
    files_before = sum(
        len(_footer_row_counts(os.path.join(out_dir, f"batch_id={b}")))
        for b in candidates
    )
    if len(run) < min_batches:
        return {"segment": None, "rows": 0, "files_before": files_before,
                "files_after": files_before, "cleaned": cleaned}

    lo, hi = run[0], run[-1]
    seg_name = f"segment={lo}-{hi}"
    tmp_dir = os.path.join(out_dir, seg_name + ".tmp")
    _rmtree(tmp_dir)
    os.makedirs(tmp_dir)

    # step 3: stream-merge (per-file memory, small files by premise);
    # partitioned sinks get one rolling writer per hive subdir so the
    # segment keeps the batch dirs' partition layout (and its pruning)
    rows_per_batch: dict[str, int] = {}
    writers: dict[str, list] = {}  # subdir -> [writer, rows_in_file, idx]
    buffers: dict[str, list] = {}  # subdir -> tables (sort_by mode only)
    schema = None
    total = 0

    def _write(sub: str, table) -> None:
        w = writers.get(sub)
        if w is None or w[0] is None:
            os.makedirs(os.path.join(tmp_dir, sub), exist_ok=True)
            idx = w[2] if w else 0
            w = writers[sub] = [
                pq.ParquetWriter(
                    os.path.join(tmp_dir, sub, f"part-{idx}.parquet"),
                    schema,
                    # cold-data rewrite: trade write-once CPU for a
                    # smaller storage footprint + less read IO (the
                    # standard Iceberg rewrite practice)
                    compression=compression,
                ),
                0,
                idx,
            ]
        w[0].write_table(table)
        w[1] += table.num_rows
        if w[1] >= target_rows_per_file:
            w[0].close()
            w[0], w[1], w[2] = None, 0, w[2] + 1

    try:
        for b in run:
            bdir = os.path.join(out_dir, f"batch_id={b}")
            rows_per_batch[str(b)] = 0
            for rel in _parquet_files_rel(bdir):
                table = pq.read_table(os.path.join(bdir, rel))
                if schema is None:
                    # Spark's TimestampType is microseconds; pyarrow reads
                    # INT96-written files back as ns — normalize so the
                    # rewritten segment round-trips through spark.read
                    schema = _us_timestamps(table.schema)
                    for c in sort_by:
                        if c not in schema.names:
                            raise ValueError(
                                f"sort_by column {c!r} not in the sink "
                                f"schema {schema.names}"
                            )
                if table.schema != schema:
                    table = table.cast(schema)  # raises if not unifiable
                sub = os.path.dirname(rel)
                rows_per_batch[str(b)] += table.num_rows
                total += table.num_rows
                if sort_by:
                    buffers.setdefault(sub, []).append(table)
                else:
                    _write(sub, table)
        if sort_by:
            import pyarrow as pa

            for sub, tables in buffers.items():
                merged = pa.concat_tables(tables).sort_by(
                    [(c, "ascending") for c in sort_by]
                )
                off = 0
                while off < merged.num_rows:
                    _write(sub, merged.slice(off, target_rows_per_file))
                    off += target_rows_per_file
    finally:
        for w in writers.values():
            if w[0] is not None:
                w[0].close()
    seg_dir = os.path.join(out_dir, seg_name)
    os.rename(tmp_dir, seg_dir)  # atomic publish
    per_file = _footer_row_counts(seg_dir)
    mtmp = os.path.join(metrics_dir, f"segment_{lo}_{hi}.json.tmp")
    with open(mtmp, "w") as fh:
        json.dump(
            {
                "lo": lo, "hi": hi, "rows": total,
                "partitions": len(per_file),
                "rows_per_file": per_file,
                "rows_per_batch": rows_per_batch,
            },
            fh,
        )
    os.rename(mtmp, mtmp[: -len(".tmp")])
    # the commit point: after this rename the segment IS the data
    ctmp = os.path.join(commit_dir, f"_COMPACT_{lo}_{hi}.tmp")
    with open(ctmp, "w") as fh:
        fh.write("ok")
    os.rename(ctmp, ctmp[: -len(".tmp")])
    if _fault_after_marker:  # DR-drill hook: crash between commit + cleanup
        raise RuntimeError("injected fault after compaction commit marker")

    # step 4: cleanup (idempotently finished by the next run if we die here)
    for b in run:
        _rmtree(os.path.join(out_dir, f"batch_id={b}"))
        mfile = os.path.join(metrics_dir, f"batch_{b}.json")
        if os.path.exists(mfile):
            os.remove(mfile)
    remaining = [b for b in candidates if b not in run]
    files_after = len(per_file) + sum(
        len(_footer_row_counts(os.path.join(out_dir, f"batch_id={b}")))
        for b in remaining
    )
    return {"segment": (lo, hi), "rows": total,
            "files_before": files_before, "files_after": files_after,
            "cleaned": cleaned}


def _rmtree(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def _us_timestamps(schema):
    """The same arrow schema with every ns timestamp field lowered to us
    (lossless here: the rows were written by Spark, whose TimestampType
    is microsecond precision)."""
    import pyarrow as pa

    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            f = f.with_type(pa.timestamp("us", tz=f.type.tz))
        fields.append(f)
    return pa.schema(fields)


def audit_sink(out_dir: str, deep: bool = False) -> dict:
    """Lineage audit over an :class:`ExactlyOnceParquetSink` output dir —
    the consumer of the per-partition lineage + metrics the sink writes.

    Checks, from the filesystem alone (no Spark session):

    - committed batch ids are contiguous from 0 (a gap means a batch's
      marker vanished after later batches committed — corruption, not
      a normal resume);
    - every committed batch has a metrics file, and the metrics row
      counts equal the parquet footers' actual row counts, file by file
      (the lineage a replayed/compacted batch must preserve);
    - no orphan batch dirs (data written but never committed — expected
      transiently mid-write, a leak if the query is stopped);
    - every :func:`compact_sink` segment: its marker, dir and metrics
      agree; per-file footer counts match; the per-batch row counts sum
      to the segment total; covered ids are committed and no two
      segments overlap. ``deep=True`` additionally reads each segment's
      ``_batch_id`` column (pyarrow, column-pruned) and re-derives the
      per-batch counts — the row-level lineage proof;
    - a covered ``batch_id=`` dir still on disk is a NOTE (pending
      cleanup after a crash mid-compaction — harmless, readers skip it),
      not a problem; an UNCOMMITTED segment dir is a problem;
    - :func:`expire_sink` retention: ids at or below the ``_EXPIRE_``
      marker are exempt from every data check (their data is GONE by
      design — they don't count toward rows); an expired segment dir
      still on disk is a pending-expiry NOTE; a segment STRADDLING the
      expire marker is a problem (retention must land on segment
      boundaries).

    Returns ``{"ok": bool, "batches": n, "rows": total,
    "problems": [...], "notes": [...]}`` — raise or alert on
    ``problems`` in production.
    """
    commit_dir = os.path.join(out_dir, "_commits")
    metrics_dir = os.path.join(out_dir, "_metrics")
    problems: list[str] = []
    notes: list[str] = []
    ids = sorted(
        int(f.rsplit("_", 1)[1])
        for f in os.listdir(commit_dir)
        if f.startswith("_COMMIT_") and not f.endswith(".tmp")
    ) if os.path.isdir(commit_dir) else []
    if ids and ids != list(range(ids[0], ids[-1] + 1)):
        problems.append(f"non-contiguous committed batch ids: {ids}")
    if ids and ids[0] != 0:
        problems.append(f"first committed batch is {ids[0]}, not 0")
    segs = _committed_segments(out_dir)
    expired = _expired_upto(out_dir)
    covered: dict[int, tuple[int, int]] = {}
    for lo, hi in segs:
        if lo <= expired < hi:
            problems.append(
                f"segment ({lo}, {hi}) straddles the expire marker "
                f"{expired}: retention must land on segment boundaries"
            )
        for b in range(lo, hi + 1):
            if b in covered:
                problems.append(
                    f"segments overlap on batch {b}: {covered[b]} and "
                    f"({lo}, {hi})"
                )
            covered[b] = (lo, hi)
            if b not in ids:
                problems.append(
                    f"segment ({lo}, {hi}) covers batch {b} which has no "
                    "_COMMIT_ marker"
                )
    total = 0
    for b in ids:
        if b <= expired:
            continue  # retention: the data is gone by design
        bpath = os.path.join(out_dir, f"batch_id={b}")
        if b in covered:
            if os.path.isdir(bpath):
                notes.append(
                    f"batch {b}: covered by segment {covered[b]}, dir "
                    "pending cleanup (crash between compaction commit and "
                    "cleanup; next compact_sink finishes it)"
                )
            continue  # rows accounted through the segment below
        mpath = os.path.join(metrics_dir, f"batch_{b}.json")
        if not os.path.exists(mpath):
            problems.append(f"batch {b}: committed but no metrics file")
            continue
        with open(mpath) as fh:
            m = json.load(fh)
        actual = _footer_row_counts(bpath) if os.path.isdir(bpath) else {}
        if m.get("rows_per_file") != actual:
            problems.append(
                f"batch {b}: metrics rows_per_file != parquet footers "
                f"({m.get('rows_per_file')} vs {actual})"
            )
        total += sum(actual.values())
    for lo, hi in segs:
        spath = os.path.join(out_dir, f"segment={lo}-{hi}")
        mpath = os.path.join(metrics_dir, f"segment_{lo}_{hi}.json")
        if hi <= expired:
            if os.path.isdir(spath):
                notes.append(
                    f"segment ({lo}, {hi}): expired, dir pending removal "
                    "(crash between the expire marker and the drop; the "
                    "next expire_sink call finishes it)"
                )
            continue  # expired: no data checks, no row contribution
        if not os.path.isdir(spath):
            problems.append(f"segment ({lo}, {hi}): committed but no dir")
            continue
        if not os.path.exists(mpath):
            problems.append(
                f"segment ({lo}, {hi}): committed but no metrics file")
            continue
        with open(mpath) as fh:
            m = json.load(fh)
        actual = _footer_row_counts(spath)
        if m.get("rows_per_file") != actual:
            problems.append(
                f"segment ({lo}, {hi}): metrics rows_per_file != parquet "
                f"footers ({m.get('rows_per_file')} vs {actual})"
            )
        per_batch = m.get("rows_per_batch", {})
        if sorted(int(k) for k in per_batch) != list(range(lo, hi + 1)):
            problems.append(
                f"segment ({lo}, {hi}): rows_per_batch keys "
                f"{sorted(per_batch)} != covered range"
            )
        if sum(per_batch.values()) != sum(actual.values()):
            problems.append(
                f"segment ({lo}, {hi}): rows_per_batch sums to "
                f"{sum(per_batch.values())}, footers say "
                f"{sum(actual.values())}"
            )
        if deep:
            derived = _segment_batch_counts(spath)
            # zero-row batches exist in the metrics but not in the data
            if derived != {int(k): v for k, v in per_batch.items() if v}:
                problems.append(
                    f"segment ({lo}, {hi}): _batch_id column counts "
                    f"{derived} != metrics rows_per_batch {per_batch}"
                )
        total += sum(actual.values())
    committed = set(ids)
    seg_names = {f"segment={lo}-{hi}" for lo, hi in segs}
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        if name.startswith("batch_id="):
            b = int(name.split("=", 1)[1])
            if b not in committed:
                problems.append(f"orphan uncommitted batch dir: {name}")
        elif name.startswith("segment=") and name not in seg_names:
            problems.append(f"orphan uncommitted segment dir: {name}")
    return {
        "ok": not problems,
        "batches": len(ids),
        "segments": len(segs),
        "expired_upto": expired,
        "rows": total,
        "problems": problems,
        "notes": notes,
    }


def _segment_batch_counts(seg_dir: str) -> dict[int, int]:
    """Row count per ``_batch_id`` inside a segment, from the data itself
    (pyarrow, one column read — the audit's deep lineage check)."""
    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    for rel in _parquet_files_rel(seg_dir):
        col = pq.read_table(
            os.path.join(seg_dir, rel), columns=["_batch_id"]
        )["_batch_id"]
        for chunk in col.chunks:
            vals, cnts = _np_unique(chunk)
            for v, c in zip(vals, cnts):
                counts[int(v)] = counts.get(int(v), 0) + int(c)
    return counts


def _np_unique(chunk):
    import numpy as np

    return np.unique(chunk.to_numpy(zero_copy_only=False), return_counts=True)


def write_stream_exactly_once(
    df: DataFrame, out_dir: str, checkpoint_dir: str,
    available_now: bool = True, fault_after_write: str | None = None,
    partition_by: tuple = (), compact_every: int | None = None,
):
    """Start a streaming write through the exactly-once sink."""
    sink = ExactlyOnceParquetSink(
        out_dir, fault_after_write=fault_after_write,
        partition_by=partition_by, compact_every=compact_every,
    )
    writer = (
        # append: every caller here emits finalized rows per micro-batch
        # (applyInPandasWithState outputs, watermark-closed aggregates)
        df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


