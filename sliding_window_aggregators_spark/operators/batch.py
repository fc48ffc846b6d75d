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

Scale notes (100 TB): both paths shuffle once on the partition key (both
need per-key ordering); the kernel path prunes columns before the
shuffle so only key/order/value/id columns move. Per-key state is O(w)
like the reference. A single pathological hot key (the Zipf'd hot
conversation of the BASELINE north rule) is defused by
:func:`sliding_rows_kernel_parallel` — the chunked-halo decomposition:
each chunk of C consecutive rows is processed independently after
warming on the (w−1)-row halo replicated from its left neighbor, which
is exact for any monoid and caps any one task at C + w − 1 rows.
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
    "hll": "double",
    "histq": "bigint",
    "cms": "bigint",
    "argmax": "bigint",
    "dfa": "bigint",
    "dfa_funnel": "bigint",
    "decayed": "double",
    "top3": "bigint",
    "minhash": "bigint",
    "adjsum": "bigint",
    "trend": "bigint",
    "toolset": "bigint",
    "maxrun": "bigint",
    "maxgap": "bigint",
}


# rows per kernel feed slice inside a mapInPandas batch: bounds the
# interval-fold's transient allocations (log-levels × slice × partial
# width) to a cache-resident working set that the allocator recycles
# across slices — see the feed-slicing note in the partitioned gens
_KERNEL_FEED_ROWS = 8192


def _lexsort_frame(pdf: pd.DataFrame, order_cols: Sequence[str]) -> np.ndarray:
    """Stable row order by order_cols (primary first) — numpy lexsort is
    several× cheaper than pandas sort_values in the per-group hot path."""
    keys = [pdf[c].to_numpy() for c in reversed(list(order_cols))]
    return np.lexsort(keys)


def _run_kernel(pdf, order_cols, value, monoid_name, w, out, id_cols, dtype):
    idx = _lexsort_frame(pdf, order_cols)
    m = get_monoid(monoid_name, dtype)
    k = SlidingCountWindow(m, w)
    vals = pdf[value].to_numpy()[idx]
    if monoid_name == "argmax":
        p = m.lift((pdf[id_cols[-1]].to_numpy()[idx], vals))
        res = m.lower(k.process_partials(p))
    else:
        res = k.process(vals.astype(np.int64) if dtype == np.int64 else vals)
    cols = {c: pdf[c].to_numpy()[idx] for c in id_cols}
    if monoid_name in ("stddev", "relvar"):
        res = np.where(np.isnan(res), None, res)
    cols[out] = res
    return pd.DataFrame(cols)


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
    # prune before the shuffle: only key/order/value/id columns move
    needed = list(dict.fromkeys([key, *order, value, *id_cols]))
    df = df.select(*needed)
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )
    order_cols = list(order)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _run_kernel(pdf, order_cols, value, monoid_name, w, out, id_cols, dtype)

    return df.groupBy(key).applyInPandas(kernel, schema)


def _with_chunk_halo(df, pos: str, chunk: int, w: int):
    """Own/halo row construction shared by the chunked-halo paths: row p is
    owned by chunk p//chunk and replicated into the next chunk when within
    the last w−1 positions before its boundary."""
    if w > chunk:
        raise ValueError(
            f"chunked-halo needs w ≤ chunk (w={w}, chunk={chunk}): the halo "
            "only replicates from the immediately preceding chunk"
        )
    own = df.withColumn("_chunk", (F.col(pos) / chunk).cast("long")).withColumn(
        "_halo", F.lit(False)
    )
    if w <= 1:
        return own
    halo = (
        df.where((F.col(pos) % chunk) >= chunk - (w - 1))
        .withColumn("_chunk", (F.col(pos) / chunk).cast("long") + 1)
        .withColumn("_halo", F.lit(True))
    )
    return own.unionByName(halo)


def sliding_rows_kernel_parallel(
    df: DataFrame,
    key: str,
    pos: str,
    value: str,
    monoid_name: str,
    w: int,
    out: str,
    chunk: int = 65536,
    id_cols: Sequence[str] = (),
    int_values: bool = False,
) -> DataFrame:
    """Hot-key-parallel sliding aggregate: the chunked-halo decomposition.

    ``pos`` must be a dense 0-based position within each key (e.g.
    ``turn_idx``). Row p is OWNED by chunk p // chunk, and additionally
    REPLICATED as a halo row into the next chunk when it lies within the
    last w−1 positions before that chunk's start. Each (key, chunk_id)
    group is then an independent task: it sorts its ≤ chunk + w − 1 rows,
    runs the kernel, and emits only the rows it owns. Exact for every
    monoid; shuffle inflation = (w−1)/chunk.

    This is the batch analogue of the north_rule's salted
    ``(conv_id, hash-bucket)`` repartition: one 10^9-turn conversation
    becomes 10^9/chunk parallel tasks instead of one straggler.
    """
    id_cols = list(id_cols) or [key, pos]
    dtype = np.int64 if int_values else np.float64
    needed = list(dict.fromkeys([key, pos, value, *id_cols]))
    df = df.select(*needed)
    allrows = _with_chunk_halo(df, pos, chunk, w)
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = np.argsort(pdf[pos].to_numpy(), kind="stable")
        m = get_monoid(monoid_name, dtype)
        k = SlidingCountWindow(m, w)
        vals = pdf[value].to_numpy()[idx]
        if monoid_name == "argmax":
            p = m.lift((pdf[id_cols[-1]].to_numpy()[idx], vals))
            res = m.lower(k.process_partials(p))
        else:
            res = k.process(vals.astype(np.int64) if dtype == np.int64 else vals)
        halo_mask = pdf["_halo"].to_numpy()[idx]
        keep = ~halo_mask
        cols = {c: pdf[c].to_numpy()[idx][keep] for c in id_cols}
        if monoid_name in ("stddev", "relvar"):
            res = np.where(np.isnan(res), None, res)
        cols[out] = res[keep]
        return pd.DataFrame(cols)

    return allrows.groupBy(key, "_chunk").applyInPandas(kernel, schema)


def sliding_rows_kernel_partitioned(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    monoid_name: str,
    w: int,
    out: str,
    id_cols: Sequence[str] = (),
    int_values: bool = False,
    chunk: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Scale-path sliding aggregate: ``repartition(key) →
    sortWithinPartitions(key, order) → mapInPandas`` with per-segment
    kernels and cross-batch carry.

    Why not ``groupBy().applyInPandas``: that path materializes one Arrow
    batch + one pandas frame PER GROUP (~1 ms each), which dominates wall
    time when keys are numerous and small — the common shape for
    conversations. Here a partition streams through in 64k-row Arrow
    batches regardless of group count; the kernel walks the (sorted)
    segment boundaries with NumPy slicing and carries the open tail
    segment's window state into the next batch. Same single shuffle, same
    results, ~10× less per-group overhead.

    ``chunk`` additionally applies the chunked-halo hot-key split (see
    :func:`sliding_rows_kernel_parallel`) before partitioning, so one
    giant key still parallelizes.
    """
    id_cols = list(id_cols) or [key] + list(order)
    dtype = np.int64 if int_values else np.float64
    needed = list(dict.fromkeys([key, *order, value, *id_cols]))
    df = df.select(*needed)
    part_cols = [key]
    halo_col = None
    if chunk is not None:
        df = _with_chunk_halo(df, order[0], chunk, w)
        part_cols = [key, "_chunk"]
        halo_col = "_halo"
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )
    nparts = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = df.repartition(int(nparts), *part_cols).sortWithinPartitions(
        *part_cols, *order
    )
    order_cols = list(order)

    def gen(batches):
        from .kernels import SegmentedSlidingKernel

        m = get_monoid(monoid_name, dtype)
        kernel = SegmentedSlidingKernel(m, w)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # sorted within partition: segment identity = key [+ chunk]
            segkey = tuple(pdf[pc].to_numpy() for pc in part_cols)
            vals = pdf[value].to_numpy()
            if dtype == np.int64:
                vals = vals.astype(np.int64)
            if monoid_name == "argmax":
                aux = pdf[id_cols[-1]].to_numpy()
            # feed the kernel in bounded slices (cross-slice carry is the
            # kernel's own cross-batch mechanism): the interval-fold
            # builds log-levels of FULL-slice partial arrays, so a whole
            # 1M-row Arrow batch of a wide-partial monoid (bloom = 512
            # B/row) means hundreds of MB of one-shot allocations —
            # measured 9x slower cold than the same rows in 8k slices,
            # which recycle one cache-resident working set
            parts = []
            for i in range(0, n, _KERNEL_FEED_ROWS):
                sl = slice(i, min(i + _KERNEL_FEED_ROWS, n))
                if monoid_name == "argmax":
                    p = m.lift((aux[sl], vals[sl]))
                else:
                    p = m.lift(vals[sl])
                parts.append(
                    m.lower(kernel.process(tuple(k[sl] for k in segkey), p))
                )
            res = np.concatenate(parts) if len(parts) > 1 else parts[0]
            if monoid_name in ("stddev", "relvar"):
                res = np.where(np.isnan(res), None, res)
            cols = {c: pdf[c].to_numpy() for c in id_cols}
            if halo_col is not None:
                keep = ~pdf[halo_col].to_numpy()
                cols = {c: v[keep] for c, v in cols.items()}
                res = res[keep]
            cols[out] = res
            yield pd.DataFrame(cols, copy=False)

    return sorted_df.mapInPandas(gen, schema)


def sliding_rows_kernel_partitioned_multi(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    specs: Sequence[tuple[str, str, int, str, bool]],
    id_cols: Sequence[str] = (),
    partitions: int | None = None,
) -> DataFrame:
    """FUSED multi-monoid sliding aggregate: ONE ``repartition(key) →
    sortWithinPartitions → mapInPandas`` pass feeding N independent
    segmented kernels — the reference's window-sharing idea applied
    across AGGREGATES instead of window sizes (one sort, one shuffle,
    one Arrow stream; each kernel keeps its own cross-batch carry).

    ``specs``: sequence of ``(value_col, monoid_name, w, out_col,
    int_values)``. This is the plan a 100 TB run uses when several
    aggregates share a key and frame — N separate kernel passes would
    shuffle and sort the fact table N times and then join."""
    id_cols = list(id_cols) or [key] + list(order)
    needed = list(
        dict.fromkeys([key, *order, *[s[0] for s in specs], *id_cols])
    )
    df = df.select(*needed)
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{s[3]}` {_OUT_SPARK_TYPE[s[1]]}" for s in specs]
    )
    nparts = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = df.repartition(int(nparts), key).sortWithinPartitions(key, *order)

    def gen(batches):
        from .kernels import SegmentedSlidingKernel

        ms = [get_monoid(s[1], np.int64 if s[4] else np.float64) for s in specs]
        kernels = [SegmentedSlidingKernel(m, s[2]) for m, s in zip(ms, specs)]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            segkey = pdf[key].to_numpy()
            cols = {c: pdf[c].to_numpy() for c in id_cols}
            for (value, mname, _w, out, int_values), m, kern in zip(
                specs, ms, kernels
            ):
                vals = pdf[value].to_numpy()
                if int_values:
                    vals = vals.astype(np.int64)
                if mname == "argmax":
                    aux = pdf[id_cols[-1]].to_numpy()
                # bounded feed slices — see sliding_rows_kernel_partitioned
                parts = []
                for i in range(0, n, _KERNEL_FEED_ROWS):
                    sl = slice(i, min(i + _KERNEL_FEED_ROWS, n))
                    if mname == "argmax":
                        p = m.lift((aux[sl], vals[sl]))
                    else:
                        p = m.lift(vals[sl])
                    parts.append(m.lower(kern.process(segkey[sl], p)))
                res = np.concatenate(parts) if len(parts) > 1 else parts[0]
                if mname in ("stddev", "relvar"):
                    res = np.where(np.isnan(res), None, res)
                cols[out] = res
            yield pd.DataFrame(cols, copy=False)

    return sorted_df.mapInPandas(gen, schema)


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
    needed = list(dict.fromkeys([key, ts_col, value, *id_cols, *tiebreak]))
    df = df.select(*needed)
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )
    sort_cols = [ts_col] + list(tiebreak)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = _lexsort_frame(pdf, sort_cols)
        m = get_monoid(monoid_name)
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)[idx]
        p = m.lift(pdf[value].to_numpy()[idx])
        res = m.lower(sliding_time_window(m, ts, p, duration_us))
        cols = {c: pdf[c].to_numpy()[idx] for c in id_cols}
        cols[out] = res
        return pd.DataFrame(cols)

    return df.groupBy(key).applyInPandas(kernel, schema)


def sliding_rows_kernel_scan(
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
    """ZERO-SHUFFLE sliding aggregate for pre-bucketed, pre-sorted
    layouts — the plan a 100 TB deployment actually runs.

    Precondition (the Iceberg ``bucket(key) + sort(key, order)`` table
    layout, produced by :func:`~..sources.io.write_bucketed`): every
    input file holds complete key groups, sorted by (key, *order), and
    the session maps one scan task per file
    (``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` ≥ file
    size — see write_bucketed's docstring). Under that layout the
    repartition+sort of :func:`sliding_rows_kernel_partitioned` is a
    no-op, so this variant feeds the SegmentedSlidingKernel straight off
    the columnar scan: no exchange, no sort, one pass.

    Results are identical to the shuffling variants; the precondition is
    NOT validated row-by-row (a violated layout silently splits key
    groups across tasks), so treat it as the trusted-layout fast path.
    """
    id_cols = list(id_cols) or [key] + list(order)
    dtype = np.int64 if int_values else np.float64
    needed = list(dict.fromkeys([key, *order, value, *id_cols]))
    df = df.select(*needed)
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {_OUT_SPARK_TYPE[monoid_name]}"]
    )

    def gen(batches):
        from .kernels import SegmentedSlidingKernel

        m = get_monoid(monoid_name, dtype)
        kernel = SegmentedSlidingKernel(m, w)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[value].to_numpy()
            if dtype == np.int64:
                vals = vals.astype(np.int64)
            if monoid_name == "argmax":
                p = m.lift((pdf[id_cols[-1]].to_numpy(), vals))
            else:
                p = m.lift(vals)
            res = m.lower(kernel.process(pdf[key].to_numpy(), p))
            if monoid_name in ("stddev", "relvar"):
                res = np.where(np.isnan(res), None, res)
            cols = {c: pdf[c].to_numpy() for c in id_cols}
            cols[out] = res
            yield pd.DataFrame(cols)

    return df.mapInPandas(gen, schema)


def sliding_positional_kernel_partitioned(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    monoid_name: str,
    start_fn,
    max_back: int,
    out: str,
    id_cols: Sequence[str] = (),
    int_values: bool = False,
    partitions: int | None = None,
    out_cast: str | None = None,
) -> DataFrame:
    """Scale-path VARIABLE count-window aggregate (dynamic fill/drain
    shapes, cpp/src/benchmark_core.h:149-183): like
    :func:`sliding_rows_kernel_partitioned` but the window of the row at
    segment position rn is [start_fn(rn), rn] (vectorized ``start_fn``
    with look-back bounded by ``max_back``)."""
    id_cols = list(id_cols) or [key] + list(order)
    dtype = np.int64 if int_values else np.float64
    needed = list(dict.fromkeys([key, *order, value, *id_cols]))
    df = df.select(*needed)
    out_type = out_cast or _OUT_SPARK_TYPE[monoid_name]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{out}` {out_type}"]
    )
    nparts = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = df.repartition(int(nparts), key).sortWithinPartitions(key, *order)

    def gen(batches):
        from .kernels import PositionalSegmentedKernel

        m = get_monoid(monoid_name, dtype)
        kernel = PositionalSegmentedKernel(m, start_fn, max_back)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf[value].to_numpy()
            if dtype == np.int64:
                vals = vals.astype(np.int64)
            res = m.lower(kernel.process(pdf[key].to_numpy(), m.lift(vals)))
            cols = {c: pdf[c].to_numpy() for c in id_cols}
            cols[out] = res
            yield pd.DataFrame(cols)

    return sorted_df.mapInPandas(gen, schema)


def sliding_time_kernel_partitioned(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: str,
    monoid_name: str,
    durations: dict[str, int],
    id_cols: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
    int_values: bool = False,
    partitions: int | None = None,
    out_cast: str | None = None,
) -> DataFrame:
    """Scale-path event-time sliding aggregate: ``repartition(key) →
    sortWithinPartitions(key, ts) → mapInPandas`` with
    :class:`TimeSegmentedKernel` — several durations answered from ONE
    pass (window sharing), one Arrow stream per partition instead of one
    pandas frame per group, cross-batch carry bounded by max(duration).

    ``durations`` maps output column → window length in µs; every output
    column is the fold over the key's rows with ts ∈ [ts_i − D, ts_i]."""
    id_cols = list(id_cols) or [key, ts_col]
    dtype = np.int64 if int_values else np.float64
    needed = list(dict.fromkeys([key, ts_col, value, *id_cols, *tiebreak]))
    df = df.select(*needed)
    out_type = out_cast or _OUT_SPARK_TYPE[monoid_name]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{col}` {out_type}" for col in durations]
    )
    nparts = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = df.repartition(int(nparts), key).sortWithinPartitions(
        key, ts_col, *tiebreak
    )

    def gen(batches):
        from .kernels import TimeSegmentedKernel

        m = get_monoid(monoid_name, dtype)
        kernel = TimeSegmentedKernel(m, durations)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            vals = pdf[value].to_numpy()
            if dtype == np.int64:
                vals = vals.astype(np.int64)
            folds = kernel.process(pdf[key].to_numpy(), ts, m.lift(vals))
            cols = {c: pdf[c].to_numpy() for c in id_cols}
            for col, part in folds.items():
                cols[col] = m.lower(part)
            yield pd.DataFrame(cols)

    return sorted_df.mapInPandas(gen, schema)


def sliding_time_kernel_scan(
    df: DataFrame,
    key: str,
    ts_col: str,
    value: str,
    monoid_name: str,
    durations: dict[str, int],
    id_cols: Sequence[str] = (),
    int_values: bool = False,
    out_cast: str | None = None,
) -> DataFrame:
    """ZERO-SHUFFLE event-time sliding aggregate for pre-bucketed,
    pre-sorted layouts — the time-window sibling of
    :func:`sliding_rows_kernel_scan`, completing the layout story across
    window types: under the Iceberg-style ``bucket(key) + sort(key, ts)``
    layout (:func:`~..sources.io.write_bucketed` with ``ts`` leading the
    sort order) the repartition+sort of
    :func:`sliding_time_kernel_partitioned` is a no-op, so the
    :class:`TimeSegmentedKernel` (several durations from ONE pass,
    bounded time-carry across Arrow batches) feeds straight off the
    columnar scan: no exchange, no sort.

    Same trusted-layout precondition as the rows variant: every input
    file holds complete key groups sorted by (key, ts); files may be
    packed whole into tasks but must never be split (bucket files below
    ``spark.sql.files.maxPartitionBytes``, or raise it)."""
    id_cols = list(id_cols) or [key, ts_col]
    dtype = np.int64 if int_values else np.float64
    needed = list(dict.fromkeys([key, ts_col, value, *id_cols]))
    df = df.select(*needed)
    out_type = out_cast or _OUT_SPARK_TYPE[monoid_name]
    schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(id_cols, _spark_types(df, id_cols))]
        + [f"`{col}` {out_type}" for col in durations]
    )

    def gen(batches):
        from .kernels import TimeSegmentedKernel

        m = get_monoid(monoid_name, dtype)
        kernel = TimeSegmentedKernel(m, durations)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            vals = pdf[value].to_numpy()
            if dtype == np.int64:
                vals = vals.astype(np.int64)
            folds = kernel.process(pdf[key].to_numpy(), ts, m.lift(vals))
            cols = {c: pdf[c].to_numpy() for c in id_cols}
            for col, part in folds.items():
                cols[col] = m.lower(part)
            yield pd.DataFrame(cols)

    return df.mapInPandas(gen, schema)


def _spark_types(df: DataFrame, cols: Sequence[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[c] for c in cols]


def with_cents(df: DataFrame, value: str = "value", out: str = "cents") -> DataFrame:
    """Exact integer representation of a 2-decimal money column — makes
    sums/maxes bit-identical across engines (no float summation order)."""
    return df.withColumn(out, F.round(F.col(value) * 100).cast("long"))


# SQL-expressible monoids: Catalyst has a native windowed aggregate whose
# semantics match the monoid's lower(fold(...)) exactly for these
_SQL_WINDOW_FN = {
    "sum": "sum",
    "count": "count",
    "max": "max",
    "min": "min",
    "mean": "avg",
}


def sliding_rows_auto(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    monoid_name: str,
    w: int,
    out: str,
    id_cols: Sequence[str] = (),
    int_values: bool = False,
    path: str = "auto",
) -> DataFrame:
    """Physical-path dispatcher: the engine's public count-window entry.

    Monoids Catalyst can express as a native ROWS-frame aggregate (sum /
    count / max / min / mean) run as a plain ``Window.rowsBetween`` —
    whole-stage codegen, zero Python. Everything else (Bloom, HLL,
    HistogramQuantile, MinCount, RelVar, reference-exact GeoMean, ArgMax)
    takes the partitioned kernel route
    (:func:`sliding_rows_kernel_partitioned`). Same single shuffle on
    ``key`` either way; tested result-equal where both paths apply.

    ``path`` pins the physical route: ``"sql"`` (error if the monoid has
    no native Window form), ``"kernel"``, or ``"auto"`` (default — native
    when possible). The two pinned routes are result-interchangeable
    wherever both apply, which the driver's ``auto_sum_w100_{sql,kernel}``
    query pair verifies under one oracle hash."""
    if path not in ("auto", "sql", "kernel"):
        raise ValueError(f"unknown path {path!r}")
    fn = _SQL_WINDOW_FN.get(monoid_name)
    if path == "sql" and fn is None:
        raise ValueError(f"monoid {monoid_name!r} has no native SQL window form")
    if fn is None or path == "kernel":
        return sliding_rows_kernel_partitioned(
            df, key, order, value, monoid_name, w, out,
            id_cols=id_cols, int_values=int_values,
        )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    id_cols = list(id_cols) or [key] + list(order)
    win = Window.partitionBy(key).orderBy(*order).rowsBetween(-(w - 1), 0)
    agg = getattr(F, fn)(F.lit(1) if monoid_name == "count" else value).over(win)
    # the two routes must be schema-interchangeable: cast the native
    # aggregate to the same output type the kernel path declares (e.g.
    # sum over a long column is bigint natively but double via the
    # monoid). NULL semantics precondition (both routes): a non-null
    # value column — native aggregates skip NULLs while the kernel lifts
    # them into the partial, so null-bearing inputs are out of contract.
    return df.select(*id_cols, agg.cast(_OUT_SPARK_TYPE[monoid_name]).alias(out))
