"""Iceberg table maintenance: rewrite_data_files + expire_snapshots.

The jar-less twins of Iceberg's own maintenance actions, completing the
write -> compact -> expire lifecycle for the Iceberg sink the same way
streaming/sink.py's compact_sink/expire_sink complete it for the
parquet-dir sink:

- ``rewrite_data_files``: a streaming sink commits one snapshot per
  micro-batch -> thousands of small files at 10^12 turns. The rewrite
  reads the live file set, rewrites it partition-clustered (optionally
  sorted) at a sane file count, and commits ONE REPLACE snapshot whose
  manifest list carries only the rewritten files. Earlier snapshots
  still reference the old files — time travel intact until expiry.
- ``expire_snapshots``: drops all but the last ``keep_last`` snapshots
  from metadata (one atomic version commit), then deletes manifest
  lists, manifests and DATA FILES no surviving snapshot references —
  the physical GC that actually frees the pre-rewrite small files.

Crash-safety matches the commit model everywhere: the rewrite's new
files are invisible orphans until its single metadata swap; expiry's
metadata commit happens BEFORE any deletion, so a crash mid-GC leaves
only unreferenced garbage (re-running expire or remove_orphan_files
finishes the cleanup, never corrupts the table).
"""

from __future__ import annotations

import os

from . import avro
from .table import IcebergTable


def rewrite_data_files(spark, location: str, *,
                       target_partitions: int | None = None,
                       sort_by: tuple = (), bounds_columns=("ts",),
                       min_files: int = 2) -> dict:
    """Compact the live file set into a REPLACE snapshot.

    ``target_partitions``: upstream task count before the partitioned
    write — with the default 1, each partition VALUE gets exactly one
    output file (the classic small-file compaction shape; raise it
    when one file per partition would exceed executor memory at scale).
    ``sort_by``: cluster rows within files (the sort-rewrite).
    Returns a report dict.
    """
    from .writer import stage_dataframe

    table = IcebergTable(location)
    before = table.plan_files()
    if len(before) < min_files:
        return {"rewritten": False, "files_before": len(before),
                "reason": f"fewer than min_files={min_files}"}
    df = table.read(spark)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    files = stage_dataframe(df, table, bounds_columns=bounds_columns,
                            target_partitions=target_partitions or 1)
    snap = table.replace_files(
        files, summary={"rewritten-data-files": len(before),
                        "spark-graft.maintenance": "rewrite_data_files"})
    return {"rewritten": True, "files_before": len(before),
            "files_after": len(files),
            "rows": sum(f["record_count"] for f in files),
            "snapshot_id": snap["snapshot-id"]}


def expire_snapshots(location: str, *, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots, then delete the
    metadata and data files only they referenced."""
    table = IcebergTable(location)
    snaps = table.snapshots
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current snapshot "
                         "can never be expired)")
    if len(snaps) <= keep_last:
        return {"expired_snapshots": [], "removed_data_files": 0,
                "removed_manifests": 0}
    keep = snaps[-keep_last:]
    expired = snaps[:-keep_last]

    # 1. the atomic metadata commit: survivors only. Deletion comes
    # AFTER — a crash between the two leaves unreferenced garbage, not
    # a broken table.
    meta = dict(table._meta)
    keep_ids = {s["snapshot-id"] for s in keep}
    meta["snapshots"] = keep
    meta["snapshot-log"] = [e for e in meta["snapshot-log"]
                            if e["snapshot-id"] in keep_ids]
    table._commit_metadata(meta)

    # 2. physical GC: anything referenced by a surviving snapshot stays
    live_mlists = {os.path.realpath(s["manifest-list"]) for s in keep}
    live_manifests, live_data = set(), set()
    for s in keep:
        _, manifests = avro.read_container(s["manifest-list"])
        for m in manifests:
            live_manifests.add(os.path.realpath(m["manifest_path"]))
            _, entries = avro.read_container(m["manifest_path"])
            for e in entries:
                if e["status"] != 2:
                    live_data.add(
                        os.path.realpath(e["data_file"]["file_path"]))

    removed_manifests = removed_data = 0
    for s in expired:
        ml = os.path.realpath(s["manifest-list"])
        if ml not in live_mlists and os.path.exists(ml):
            _, manifests = avro.read_container(ml)
            for m in manifests:
                mp = os.path.realpath(m["manifest_path"])
                if mp not in live_manifests and os.path.exists(mp):
                    _, entries = avro.read_container(mp)
                    for e in entries:
                        dp = os.path.realpath(
                            e["data_file"]["file_path"])
                        if dp not in live_data and os.path.exists(dp):
                            os.unlink(dp)
                            removed_data += 1
                    os.unlink(mp)
                    removed_manifests += 1
            os.unlink(ml)
    return {"expired_snapshots": [s["snapshot-id"] for s in expired],
            "removed_data_files": removed_data,
            "removed_manifests": removed_manifests}
