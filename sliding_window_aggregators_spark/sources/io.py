"""Format-agnostic table IO — the engine's source/sink surface.

The reference's ``data_benchmark`` consumes CSV event datasets
(cpp/src/data_benchmark.cc:102-140); this module gives every query the
same data regardless of container: parquet (the primary columnar path —
predicate pushdown + column pruning reach the scan), ORC (the other
native columnar format — same pushdown/pruning machinery), CSV and
JSON-lines
(row formats — Spark still prunes columns at the parse step when a
schema is supplied).

Scale notes: always pass an explicit ``schema`` for row formats in
production — schema inference is a full extra pass over the data. For
parquet the writer emits snappy by default; partition columns
(``partition_by``) turn eviction/retention into directory drops and give
partition pruning to every downstream filter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_READERS = ("parquet", "orc", "csv", "json")


def spread_small_scan(df: DataFrame, *key_cols: str, parallelism: int | None = None) -> DataFrame:
    """Re-spread an under-parallel scan across the session's cores.

    The test corpus tables are single-file, single-row-group parquet —
    an unsplittable input (guide: input skew): every scan is ONE task, so
    any map-heavy work fused into the scan stage (explodes, Arrow
    synthesis, per-row scoring) runs on one core no matter how many the
    session has. This helper repartitions by the table's unique key
    (deterministic hash — never rand-derived) ONLY when the scan's
    planned parallelism is below the session's, so at production scale
    (thousands of splits) it is a no-op and no shuffle is added; locally
    it costs one exchange of a few MB and unlocks a cores-×
    speedup of everything fused after it."""
    spark = df.sparkSession
    n = parallelism or spark.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # plan not translatable to an RDD probe — leave as is
        return df
    if cur >= max(2, n // 2):
        return df
    return df.repartition(n, *key_cols) if key_cols else df.repartition(n)


def _infer_format(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    base = path.rstrip("/")
    for ext in _READERS:
        if base.endswith("." + ext):
            return ext
    # directory of files: sniff the first data file's extension
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            for ext in _READERS:
                if name.endswith("." + ext):
                    return ext
    return "parquet"


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Read a table from parquet/CSV/JSON, inferring the format from the
    path when not given. CSV defaults to header=true; timestamps parse as
    TIMESTAMP_NTZ when the schema says so (matching the parquet layout)."""
    fmt = _infer_format(path, fmt)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def write_bucketed(
    df: DataFrame,
    path: str,
    key: str,
    order: list[str],
    buckets: int = 128,
) -> None:
    """Write the bucket(key) + sort(key, *order) layout that lets the
    sliding-window kernels run SHUFFLE-FREE off the scan
    (:func:`~..operators.batch.sliding_rows_kernel_scan`): every output
    file holds complete key groups, rows sorted by (key, *order).

    To get the one-task-per-file scan the layout promises, the reading
    session must not split or coalesce files::

        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        spark.conf.set("spark.sql.files.openCostInBytes", "1g")

    (set ≥ the largest bucket file; an Iceberg/production deployment
    expresses the same contract as a bucket partition transform +
    sort order, where the table format enforces it.)"""
    (
        df.repartition(buckets, key)
        .sortWithinPartitions(key, *order)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    fmt = _infer_format(path, fmt)
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    fmt: str | None = None,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction — the 100 TB operational chore: a streaming
    sink or partitioned ingest leaves thousands of KB-scale files whose
    per-file open/footer cost eventually dominates scans. Rewrites the
    table with ``ceil(rows / target_rows_per_file)`` output files and
    swaps directories (write to ``<path>.__compact__``, then two renames).
    Returns (files_before, files_after).

    Hive-partitioned tables MUST pass ``partition_by`` or the rewrite
    flattens the directory layout (and loses partition pruning).

    Crash-safety contract: the swap is two renames, not one atomic op —
    a crash between them leaves the data intact at ``<path>.__old__``
    (never lost, but the table path is briefly absent). Leftover
    ``.__old__`` / ``.__compact__`` directories from an interrupted run
    are cleaned up at the start of the next. In an Iceberg/production
    deployment this whole dance is the table format's atomic
    rewrite-data-files snapshot commit."""
    import math
    import shutil

    fmt = _infer_format(path, fmt)
    base = path.rstrip("/")
    tmp = base + ".__compact__"
    old = base + ".__old__"
    # recover from a previous interrupted run
    if os.path.exists(old) and not os.path.exists(base):
        os.rename(old, base)  # crash landed between the two renames
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    df = read_table(spark, path, fmt=fmt)
    n = df.count()
    files_before = sum(
        1
        for _dir, _sub, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(n / target_rows_per_file))
    # write through write_table so format defaults (e.g. CSV headers)
    # match what read_table expects on the way back in
    write_table(
        df.repartition(n_files), tmp, fmt=fmt, partition_by=partition_by
    )
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old)
    files_after = sum(
        1
        for _dir, _sub, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    return files_before, files_after
