"""Iceberg table -> Structured Streaming source (jar-less scan path).

A streaming read of an Iceberg table is a monotonically growing set of
immutable data files (append snapshots never mutate files — the spec's
core invariant). Spark's file stream source already gives exactly-once
resumable offsets over a growing directory (the seen-files log lives in
the query checkpoint), so the jar-less streaming read is:

  plan the table's current snapshot -> SYMLINK each planned data file
  under a stable content-derived name into a flat link dir -> let
  ``readStream.parquet(link_dir)`` tail it.

``materialize_scan`` is idempotent (stable names = md5(table path)), so
re-running it after new commits only ADDS links; the file source's
checkpointed log skips everything already consumed — offsets are
effectively snapshot-incremental, and a job resumed from its checkpoint
continues exactly where it stopped (north rule: "checkpoint-resumable
offsets").

``added_files`` exposes the underlying snapshot-incremental plan
(Iceberg's incremental read: ADDED manifest entries of snapshots in
(from, to]) for callers that want explicit per-snapshot batches.
"""

from __future__ import annotations

import os
from hashlib import md5

from . import avro
from .table import IcebergTable, iceberg_to_spark_schema


def added_files(table: IcebergTable, *, from_snapshot: int | None,
                to_snapshot: int | None = None):
    """Data files ADDED by snapshots in (from_snapshot, to_snapshot]
    — the spec's incremental append scan. ``from_snapshot=None`` means
    from the beginning."""
    snaps = table.snapshots
    if to_snapshot is None and snaps:
        to_snapshot = snaps[-1]["snapshot-id"]
    picked = [s for s in snaps
              if (from_snapshot is None or s["snapshot-id"] > from_snapshot)
              and s["snapshot-id"] <= to_snapshot]
    out = []
    for s in picked:
        _, manifests = avro.read_container(s["manifest-list"])
        for m in manifests:
            if m["added_snapshot_id"] != s["snapshot-id"]:
                continue  # older manifest carried forward in the list
            _, entries = avro.read_container(m["manifest_path"])
            for e in entries:
                if e["status"] == 1 and e["snapshot_id"] == s["snapshot-id"]:
                    out.append({"path": e["data_file"]["file_path"],
                                "snapshot_id": s["snapshot-id"],
                                "record_count":
                                    e["data_file"]["record_count"]})
    return out


def materialize_scan(location: str, link_dir: str, *,
                     snapshot_id: int | None = None) -> list[str]:
    """Symlink the snapshot's planned data files into ``link_dir``
    under stable names; idempotent. Returns newly-created link paths.

    APPEND-ONLY CONTRACT: links are keyed by file path, so a
    ``rewrite_data_files`` / ``expire_snapshots`` on the source table
    would surface compacted files as brand-new links (re-delivering
    every already-consumed row) while existing links to expired files
    dangle. This refuses non-append history outright — a table that is
    compacted/expired while streamed needs the snapshot-incremental
    planner (:func:`added_files`) instead — and prunes any dangling
    links left by out-of-band deletion before the file source lists
    them."""
    table = IcebergTable(location)
    for s in table.snapshots:
        op = s.get("summary", {}).get("operation", "append")
        if op not in ("append",):
            raise RuntimeError(
                f"materialize_scan: snapshot {s['snapshot-id']} is "
                f"{op!r}, not append — this table's history has been "
                "rewritten (compaction/expiry), so the link-dir file "
                "stream would re-deliver consumed rows; stream via the "
                "added_files incremental planner, or do not compact/"
                "expire a table while it is being streamed")
    os.makedirs(link_dir, exist_ok=True)
    created = []
    for name in os.listdir(link_dir):
        dest = os.path.join(link_dir, name)
        if os.path.islink(dest) and not os.path.exists(dest):
            os.unlink(dest)  # dangling: target deleted out-of-band
    for f in table.plan_files(snapshot_id=snapshot_id):
        src = os.path.realpath(f["path"])
        name = md5(src.encode()).hexdigest() + ".parquet"
        dest = os.path.join(link_dir, name)
        if not os.path.lexists(dest):
            os.symlink(src, dest)
            created.append(dest)
    return created


def stream_from_iceberg(spark, location: str, link_dir: str, *,
                        max_files_per_trigger: int = 0,
                        columns: tuple = ()):
    """readStream over an Iceberg table: materialize the current
    snapshot, then tail the link dir with the table's own schema
    (lineage columns like ``_batch_id`` stamped by an upstream sink are
    dropped unless requested via ``columns``)."""
    table = IcebergTable(location)
    materialize_scan(location, link_dir)
    schema = iceberg_to_spark_schema(table.schema)
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(link_dir)
    if columns:
        df = df.select(*columns)
    return df
