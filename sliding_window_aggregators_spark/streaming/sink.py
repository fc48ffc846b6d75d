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
    def __init__(self, out_dir: str, fault_after_write: str | None = None):
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
        stamped.write.mode("overwrite").parquet(path)
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

    def committed_batches(self) -> list[int]:
        return sorted(
            int(f.rsplit("_", 1)[1])
            for f in os.listdir(self.commit_dir)
            if f.startswith("_COMMIT_") and not f.endswith(".tmp")
        )

    def read_committed(self, spark) -> DataFrame:
        ids = self.committed_batches()
        paths = [os.path.join(self.out_dir, f"batch_id={b}") for b in ids]
        return spark.read.parquet(*paths) if paths else None


def _footer_row_counts(path: str) -> dict:
    """num_rows per parquet file under ``path``, from the footers."""
    import pyarrow.parquet as pq

    return {
        name: pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
        for name in sorted(os.listdir(path))
        if name.endswith(".parquet")
    }


def _footer_row_count(path: str) -> int:
    """Sum of num_rows from the parquet footers under ``path``."""
    return sum(_footer_row_counts(path).values())


def audit_sink(out_dir: str) -> dict:
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
      transiently mid-write, a leak if the query is stopped).

    Returns ``{"ok": bool, "batches": n, "rows": total,
    "problems": [...]}`` — raise or alert on ``problems`` in production.
    """
    commit_dir = os.path.join(out_dir, "_commits")
    metrics_dir = os.path.join(out_dir, "_metrics")
    problems: list[str] = []
    ids = sorted(
        int(f.rsplit("_", 1)[1])
        for f in os.listdir(commit_dir)
        if f.startswith("_COMMIT_") and not f.endswith(".tmp")
    ) if os.path.isdir(commit_dir) else []
    if ids and ids != list(range(ids[0], ids[-1] + 1)):
        problems.append(f"non-contiguous committed batch ids: {ids}")
    if ids and ids[0] != 0:
        problems.append(f"first committed batch is {ids[0]}, not 0")
    total = 0
    for b in ids:
        mpath = os.path.join(metrics_dir, f"batch_{b}.json")
        bpath = os.path.join(out_dir, f"batch_id={b}")
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
    committed = set(ids)
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        if name.startswith("batch_id="):
            b = int(name.split("=", 1)[1])
            if b not in committed:
                problems.append(f"orphan uncommitted batch dir: {name}")
    return {
        "ok": not problems,
        "batches": len(ids),
        "rows": total,
        "problems": problems,
    }


def write_stream_exactly_once(
    df: DataFrame, out_dir: str, checkpoint_dir: str,
    available_now: bool = True, fault_after_write: str | None = None,
):
    """Start a streaming write through the exactly-once sink."""
    sink = ExactlyOnceParquetSink(out_dir, fault_after_write=fault_after_write)
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


