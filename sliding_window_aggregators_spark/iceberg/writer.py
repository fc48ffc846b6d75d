"""Spark DataFrame -> Iceberg append: the write path.

Evaluates the table's partition transforms Spark-side (identity/hour as
JVM expressions; bucket[N] as a vectorized Arrow pandas_udf running the
numpy murmur3 below — no per-row Python), stages the parquet files with
``partitionBy`` on derived ``__pt_*`` columns (so the source columns
stay IN the data files, which is what lets the jar-less scan path
re-read them without metadata column injection), harvests record counts
and column min/max bounds from the parquet footers via pyarrow, moves
the files into ``data/`` and commits one append snapshot.

Iceberg conformance note: timestamps are written as INT64 micros
(``spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS``) — the
Iceberg spec's required parquet physical type (INT96 is not allowed) —
which also gives footer min/max stats for bounds pruning.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import spec as icespec
from .table import IcebergTable


def murmur3_long_np(vals: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 of int64 values (little-endian 8-byte
    input, per Iceberg spec Appendix B) — two uint32 words per value."""
    v = vals.astype(np.int64).view(np.uint64)
    w0 = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    w1 = (v >> np.uint64(32)).astype(np.uint32)
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    h = np.zeros(len(v), np.uint32)
    with np.errstate(over="ignore"):
        for k in (w0, w1):
            k = k * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h = h ^ k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)  # input length
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h


def _bucket_udf(n: int, iceberg_type: str):
    """pandas_udf computing bucket[N] partition values, Arrow-batched."""
    int_like = iceberg_type in ("int", "long", "date",
                                "timestamp", "timestamptz")

    @F.pandas_udf("int")
    def bucket(col: pd.Series) -> pd.Series:
        isna = col.isna()
        if int_like:
            if pd.api.types.is_datetime64_any_dtype(col):
                # defensive only: timestamp/date sources are converted to
                # UTC micros/days JVM-side before this UDF (see the
                # callsite) so the hash never sees session-local renderings
                vals = col.astype("int64").to_numpy() // 1000
            else:
                vals = (
                    pd.to_numeric(col, errors="coerce")
                    .fillna(0)
                    .to_numpy(dtype="int64")
                )
            h = murmur3_long_np(vals)
        else:
            # strings: hash each UNIQUE value once (conversation ids
            # repeat heavily), then map back — vectorized join, the
            # per-unique python murmur3 is off the per-row path
            uniq = pd.Series(col.dropna().unique())
            hu = uniq.map(lambda s: icespec.murmur3_x86_32(
                str(s).encode("utf-8")))
            h = col.map(dict(zip(uniq, hu))).to_numpy(dtype="float64")
            h = np.nan_to_num(h).astype(np.uint32)
        out = pd.Series(
            ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype("int32")
        ).astype("Int32")
        # null source values belong to the NULL partition (spec: transforms
        # of null are null), not to whatever bucket hash(0) lands in
        out[isna.to_numpy()] = pd.NA
        return out

    return bucket


def write_dataframe(df: DataFrame, table: IcebergTable, *,
                    bounds_columns=("ts",), summary=None,
                    target_partitions: int | None = None,
                    fault_before_commit: str | None = None,
                    abort_if=None):
    """Append ``df`` to ``table`` as one snapshot; returns (snapshot,
    files). ``bounds_columns``: columns whose footer min/max feed the
    per-file bounds (scan pruning). ``target_partitions``: optional
    coalesce before write (small-batch streaming sinks).
    ``fault_before_commit``: DR-drill kill switch — die AFTER the data
    files land in data/, BEFORE the snapshot commit (the crash window
    Iceberg's visibility rule exists for; the files stay orphans).
    ``abort_if``: forwarded to :meth:`IcebergTable.append_files` — the
    idempotence re-check on every conflict retry (raises CommitAborted;
    the staged files stay invisible orphans)."""
    files = stage_dataframe(df, table, bounds_columns=bounds_columns,
                            target_partitions=target_partitions)
    if fault_before_commit is not None:
        try:
            os.close(os.open(fault_before_commit,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            os._exit(70)  # driver power cut: data on disk, no snapshot
        except FileExistsError:
            pass
    snap = table.append_files(files, summary=summary, abort_if=abort_if)
    return snap, files


def stage_dataframe(df: DataFrame, table: IcebergTable, *,
                    bounds_columns=("ts",),
                    target_partitions: int | None = None):
    """Write ``df``'s parquet files into data/ WITHOUT committing a
    snapshot — invisible until registered (Iceberg's visibility rule).
    Returns the file descriptors append_files / replace commits take."""
    spark = df.sparkSession
    # Iceberg requires INT64-micros timestamps (INT96 is non-conformant
    # and stat-less) — but ONLY for this write: leaving the conf set
    # session-wide changes every later parquet write's physical type
    # (and e.g. DuckDB reads annotated micros as TIMESTAMPTZ where it
    # reads INT96 as naive), so save/restore around the job.
    _TS_KEY = "spark.sql.parquet.outputTimestampType"
    prev_ts = spark.conf.get(_TS_KEY, None)
    spark.conf.set(_TS_KEY, "TIMESTAMP_MICROS")
    pfields = table.partition_fields
    pt_cols = []
    for f in pfields:
        cname = f"__pt_{f['name']}"
        tr = f["transform"]
        if tr.name == "bucket":
            src = F.col(f["source"])
            stype = f["source_type"]
            # convert time-typed sources to the spec's hash input JVM-side
            # (UTC micros / epoch days) BEFORE the Arrow bridge: the
            # pandas rendering of a TIMESTAMP follows the session
            # timezone, so hashing it directly mis-buckets under any
            # non-UTC session
            if stype in ("timestamp", "timestamptz"):
                src, stype = F.unix_micros(src), "long"
            elif stype == "date":
                src, stype = F.unix_date(src), "int"
            df = df.withColumn(cname, _bucket_udf(tr.n, stype)(src))
        else:
            df = df.withColumn(
                cname, F.expr(tr.sql_expr(f["source"], f["source_type"])))
        pt_cols.append(cname)

    staging = os.path.join(table.location, "data",
                           f"_staging-{uuid.uuid4().hex}")
    if target_partitions:
        df = df.coalesce(target_partitions)
    try:
        w = df.write.mode("overwrite")
        if pt_cols:
            w = w.partitionBy(*pt_cols)
        w.parquet(staging)
    finally:
        if prev_ts is None:
            spark.conf.unset(_TS_KEY)
        else:
            spark.conf.set(_TS_KEY, prev_ts)

    return _promote_staged(staging, table, pfields, bounds_columns)


def _promote_staged(staging: str, table: IcebergTable, pfields,
                    bounds_columns):
    """Move staged part files into data/, harvesting footer stats."""
    import pyarrow.parquet as pq

    data_dir = os.path.join(table.location, "data")
    files = []
    for root, _dirs, names in os.walk(staging):
        for name in names:
            if not (name.endswith(".parquet") and name.startswith("part-")):
                continue
            src = os.path.join(root, name)
            rel = os.path.relpath(root, staging)
            part = {}
            for seg in (rel.split(os.sep) if rel != "." else ()):
                k, _, v = seg.partition("=")
                pname = k[len("__pt_"):]
                f = next(p for p in pfields if p["name"] == pname)
                v = urllib.parse.unquote(v)
                if v == "__HIVE_DEFAULT_PARTITION__":
                    part[pname] = None
                elif f["result_type"] in ("int", "long", "date"):
                    part[pname] = int(v)
                else:
                    part[pname] = v
            dest_dir = (os.path.join(data_dir, rel) if rel != "."
                        else data_dir)
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, f"{uuid.uuid4().hex}-{name}")
            os.rename(src, dest)

            md = pq.ParquetFile(dest).metadata
            lb, ub = {}, {}
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            for col in bounds_columns:
                if col not in idx:
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[col]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    mn, mx = st.min, st.max
                    if isinstance(mn, pd.Timestamp) or hasattr(mn, "timestamp"):
                        mn = int(pd.Timestamp(mn).value // 1000)
                        mx = int(pd.Timestamp(mx).value // 1000)
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                if lo is not None:
                    lb[col], ub[col] = lo, hi
            files.append({
                "path": dest,
                "record_count": md.num_rows,
                "file_size_in_bytes": os.path.getsize(dest),
                "partition": part,
                "lower_bounds": lb or None,
                "upper_bounds": ub or None,
            })
    shutil.rmtree(staging, ignore_errors=True)
    return files


def ts_micros(ts) -> int:
    """datetime-ish -> Iceberg timestamp micros (bounds_filter helper)."""
    return int(pd.Timestamp(ts).value // 1000)
