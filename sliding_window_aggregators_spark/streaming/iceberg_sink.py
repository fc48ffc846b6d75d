"""Exactly-once streaming sink writing to a pure-Python Iceberg table.

This is the executed form of the swap point sink.py documents
("swap _write_parquet for df.writeTo(table).append() under an Iceberg
catalog and the commit log is Iceberg's snapshot"): with the jar-less
iceberg/ package the commit log IS the table's snapshot list —

- every micro-batch stages parquet files and commits ONE append
  snapshot whose summary carries ``spark-graft.batch-id`` (the same
  summary-property idempotence recipe Iceberg's own Spark streaming
  sink uses for exactly-once);
- a replayed batch (checkpoint resume, driver crash) finds its batch id
  in a committed snapshot's summary and skips — rewritten staging files
  from the crashed attempt are unreferenced by any snapshot and thus
  invisible (Iceberg's core visibility rule), removable later with
  ``remove_orphan_files``;
- unlike ExactlyOnceParquetSink (driver-local marker dir — refuses
  remote storage), this commit protocol is an atomic swap of the table
  metadata pointer, which is exactly what survives a driver failover on
  shared storage;
- per-partition lineage: rows are stamped with ``_batch_id`` /
  ``_partition_id`` like the parquet sink, and each snapshot's manifest
  records per-file record counts + column bounds (footer stats).

Reference parity: none (in-memory library) — north-rule surface
("writes exactly-once to an Iceberg sink with per-partition lineage and
checkpoint-resumable offsets").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..iceberg import IcebergTable
from ..iceberg.table import CommitAborted
from ..iceberg.writer import write_dataframe


class ExactlyOnceIcebergSink:
    """``foreachBatch`` callable committing each micro-batch as one
    Iceberg append snapshot, idempotent on batch id."""

    def __init__(self, location: str, *, partition_spec=(),
                 bounds_columns=("ts",), fault_before_commit: str | None = None,
                 target_partitions: int | None = None):
        self.location = location
        self.partition_spec = tuple(partition_spec)
        self.bounds_columns = tuple(bounds_columns)
        self.fault_before_commit = fault_before_commit
        self.target_partitions = target_partitions

    def _table(self, df: DataFrame | None = None) -> IcebergTable | None:
        try:
            return IcebergTable(self.location)
        except FileNotFoundError:
            if df is None:
                return None
            # lazy create on first batch, from the stamped batch schema
            stamped = self._stamp(df)
            return IcebergTable.create(
                self.location, stamped.schema,
                partition_spec=self.partition_spec,
                properties={"write.wap.enabled": "false",
                            "spark-graft.sink": "streaming"})

    @staticmethod
    def _stamp(df: DataFrame) -> DataFrame:
        return (df.withColumn("_batch_id", F.lit(0).cast("long"))
                  .withColumn("_partition_id", F.spark_partition_id())
                if "_batch_id" not in df.columns else df)

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        table = self._table(df)
        if table.snapshot_by_batch(batch_id) is not None:
            return  # replayed after checkpoint-resume: idempotent skip
        stamped = (df.withColumn("_batch_id",
                                 F.lit(batch_id).cast("long"))
                     .withColumn("_partition_id", F.spark_partition_id()))
        try:
            write_dataframe(
                stamped, table,
                bounds_columns=self.bounds_columns,
                summary={"spark-graft.batch-id": batch_id},
                target_partitions=self.target_partitions,
                fault_before_commit=self.fault_before_commit,
                # the pre-staging check above is check-then-act: a zombie
                # driver and its failover can both pass it. The commit
                # retry loop re-checks the batch id after EVERY conflict
                # refresh and aborts instead of double-committing — the
                # second half of the exactly-once argument
                abort_if=lambda t: t.snapshot_by_batch(batch_id)
                is not None)
        except CommitAborted:
            return  # a concurrent driver committed this batch first
        # NOTE durability interplay: the replay-skip reads the batch-id
        # summaries of COMMITTED snapshots, so expire_snapshots must keep
        # every snapshot whose batch Spark could still replay
        # (keep_last >= the checkpoint's replay horizon) or a replayed
        # batch would re-commit rows the expiry erased the evidence for.

    # -- reader / introspection (parquet-sink interface parity) ----------

    def committed_batches(self) -> list[int]:
        table = self._table()
        if table is None:
            return []
        out = []
        for s in table.snapshots:
            b = s.get("summary", {}).get("spark-graft.batch-id")
            if b is not None:
                out.append(int(b))
        return sorted(out)

    def read_committed(self, spark, **scan_kwargs) -> DataFrame:
        table = self._table()
        if table is None:
            raise FileNotFoundError(f"no table at {self.location}")
        return table.read(spark, **scan_kwargs)


def write_stream_exactly_once_iceberg(
        df: DataFrame, location: str, checkpoint_dir: str, *,
        available_now: bool = True, partition_spec=(),
        bounds_columns=("ts",), fault_before_commit: str | None = None,
        target_partitions: int | None = 4):
    """Start a streaming write through the Iceberg exactly-once sink."""
    sink = ExactlyOnceIcebergSink(
        location, partition_spec=partition_spec,
        bounds_columns=bounds_columns,
        fault_before_commit=fault_before_commit,
        target_partitions=target_partitions)
    writer = (df.writeStream.outputMode("append")
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def audit_iceberg_sink(location: str) -> dict:
    """Lineage audit from the table's own metadata: every snapshot's
    summary row/file counts must equal what its manifests record, batch
    ids must be unique, and every live data file must exist on disk at
    its manifest-recorded size (the Iceberg twin of sink.audit_sink)."""
    from ..iceberg.source import added_files

    table = IcebergTable(location)
    notes = []
    seen_batches = set()
    for s in table.snapshots:
        sid = s["snapshot-id"]
        added = added_files(table, from_snapshot=sid - 1, to_snapshot=sid)
        rows = sum(f["record_count"] for f in added)
        summ = s.get("summary", {})
        if int(summ.get("added-records", -1)) != rows:
            notes.append(f"snapshot {sid}: summary added-records "
                         f"{summ.get('added-records')} != manifests {rows}")
        if int(summ.get("added-data-files", -1)) != len(added):
            notes.append(f"snapshot {sid}: summary added-data-files "
                         f"{summ.get('added-data-files')} != "
                         f"manifests {len(added)}")
        b = summ.get("spark-graft.batch-id")
        if b is not None:
            if b in seen_batches:
                notes.append(f"duplicate batch id {b} (snapshot {sid})")
            seen_batches.add(b)
    live = table.plan_files()
    for f in live:
        if not os.path.exists(f["path"]):
            notes.append(f"missing data file {f['path']}")
        elif os.path.getsize(f["path"]) != f["file_size_in_bytes"]:
            notes.append(f"size mismatch {f['path']}")
    return {"ok": not notes, "snapshots": len(table.snapshots),
            "batches": len(seen_batches),
            "rows": sum(f["record_count"] for f in live),
            "files": len(live), "notes": notes}


def remove_orphan_files(location: str,
                        older_than_s: float = 3 * 24 * 3600) -> list[str]:
    """Delete data files referenced by NO snapshot (failed-attempt
    debris left before a commit — Iceberg's remove_orphan_files).

    Two in-flight-write guards, matching the real action's semantics:
    ``_staging-*`` directories (a write staging right now) are never
    entered, and only files whose mtime is older than ``older_than_s``
    (default 3 days, Iceberg's default) are deleted — a staged-but-not-
    yet-committed file of a concurrent writer is younger than any sane
    cutoff, so the in-flight commit can still register it. Pass
    ``older_than_s=0`` only when no write can be in flight (tests, DR
    drills)."""
    import time as _time

    table = IcebergTable(location)
    referenced = set()
    for s in table.snapshots:
        for f in table.plan_files(snapshot_id=s["snapshot-id"]):
            referenced.add(os.path.realpath(f["path"]))
    removed = []
    cutoff = _time.time() - older_than_s
    data_dir = os.path.join(table.location, "data")
    for root, dirs, names in os.walk(data_dir):
        dirs[:] = [d for d in dirs if not d.startswith("_staging-")]
        for n in names:
            p = os.path.join(root, n)
            if (n.endswith(".parquet")
                    and os.path.realpath(p) not in referenced
                    and os.path.getmtime(p) <= cutoff):
                os.unlink(p)
                removed.append(p)
    return removed
