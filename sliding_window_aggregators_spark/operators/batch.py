"""DataFrame-level batch window operators.

Two execution paths for every windowed aggregate, mirroring the
reference's differential-testing design (cpp/src/test.cc:45-140 runs every
algorithm in lockstep against ReCalc):

- the **SQL path**: plain ``pyspark.sql.Window`` frames — whole-stage
  codegen, JVM-side, used whenever the monoid maps to a built-in
  (SURVEY.md §2.A "Spark primitive" column);
- the **kernel path**: ``groupBy(key).applyInPandas`` running the
  vectorized SWAG kernels from :mod:`.kernels` — used for monoids Spark
  has no built-in for (MinCount, Bloom, float32-parity GeoMean) and to
  prove the kernels against the SQL path.

Scale notes (100 TB): the kernel path shuffles once on the partition key
and then streams each group through Arrow — the same shuffle the SQL
window path needs (both require per-key ordering). Per-key state is O(w)
exactly like the reference's in-memory aggregator. Keys are assumed to be
many and individually executor-sized (conversations / users); a single
pathological giant key is the streaming engine's salted-bucket job
(streaming.engine), not the batch path's.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.monoids import get_monoid
from .kernels import SlidingCountWindow, sliding_time_window

_OUT_SPARK_TYPE = {
    "sum": "double",
    "count": "bigint",
    "max": "double",
    "min": "double",
    "mean": "double",
    "geomean": "double",
    "stddev": "double",
    "mincount": "bigint",
    "relvar": "double",
    "bloom": "bigint",
    "argmax": "bigint",
}


def sliding_rows_kernel(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    monoid_name: str,
    w: int,
    out: str,
    id_cols: Sequence[str] = (),
    int_values: bool = False,
) -> DataFrame:
    """ROWS-BETWEEN sliding aggregate via the vectorized SWAG kernel.

    Emits one row per input row: ``id_cols + [out]`` where ``out`` is the
    aggregate of the last ``w`` rows of the key's stream in ``order``.
    """
    id_cols = list(id_cols) or [key] + list(order)
    dtype = np.int64 if int_values else np.float64
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )
    order_cols = list(order)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        m = get_monoid(monoid_name, dtype)
        k = SlidingCountWindow(m, w)
        vals = pdf[value].to_numpy()
        if monoid_name == "argmax":
            p = m.lift((pdf[id_cols[-1]].to_numpy(), vals))
            res = m.lower(k.process_partials(p))
        else:
            res = k.process(vals if not int_values else vals.astype(np.int64))
        out_pdf = pdf[id_cols].copy()
        if monoid_name == "stddev":
            res = np.where(np.isnan(res), None, res)
        out_pdf[out] = res
        return out_pdf

    return df.groupBy(key).applyInPandas(kernel, schema)


def sliding_time_kernel(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: str,
    monoid_name: str,
    duration_us: int,
    out: str,
    id_cols: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """RANGE-BETWEEN (event-time) sliding aggregate via the kernel:
    out_i = fold over rows of the key with ts ∈ [ts_i − duration, ts_i]
    (inclusive both ends — the reference admits rows while
    ``youngest − oldest ≤ duration``, cpp/src/benchmark_core.h:584-590)."""
    id_cols = list(id_cols) or [key, ts_col]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )
    sort_cols = [ts_col] + list(tiebreak)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        m = get_monoid(monoid_name)
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        p = m.lift(pdf[value].to_numpy())
        res = m.lower(sliding_time_window(m, ts, p, duration_us))
        out_pdf = pdf[id_cols].copy()
        out_pdf[out] = res
        return out_pdf

    return df.groupBy(key).applyInPandas(kernel, schema)


def _spark_types(df: DataFrame, cols: Sequence[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[c] for c in cols]


def with_cents(df: DataFrame, value: str = "value", out: str = "cents") -> DataFrame:
    """Exact integer representation of a 2-decimal money column — makes
    sums/maxes bit-identical across engines (no float summation order)."""
    return df.withColumn(out, F.round(F.col(value) * 100).cast("long"))
