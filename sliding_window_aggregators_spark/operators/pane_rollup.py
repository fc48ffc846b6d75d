"""Batch pane rollup: pure-Catalyst ``(size, slide)`` sliding windows.

Spark's built-in ``F.window(ts, size, slide)`` EXPLODES every row into
its ``size/slide`` overlapping windows before aggregating — per-row
work and in-memory width scale with the overlap factor, which is the
exact cost "No pane, no gain" (Li et al., SIGMOD Record 34(1) 2005)
was written to remove. This module is the paper's two-stage plan as a
plain DataFrame composition, the batch twin of the streaming
:func:`~..streaming.engine.sliding_panes_stream`:

1. **pane partials** — ``groupBy(key, pane)`` where
   ``pane = ts − ts mod slide``: each row is aggregated ONCE; Catalyst
   injects map-side partial aggregation, so the first shuffle moves one
   partial per (key, pane, input partition), not rows — the built-in
   equivalent of the streaming side's map-side pane pre-combine.
2. **pane→window fan-out** — each pane partial explodes into the
   ``size/slide`` window-ends it feeds (``pane + k·slide``) and a
   second ``groupBy(key, window_end)`` folds the ≤ size/slide partials
   per window. The explosion factor is paid on the PANE table
   (|keys| × |occupied panes| rows), which is smaller than the input by
   the rows-per-pane factor.

Whole plan: two hash-aggregate exchanges, zero Python, whole-stage
codegen end-to-end. Aggregation CPU is O(rows + panes × size/slide)
versus the built-in's O(rows × size/slide).

Crossover (measured, same 8-core session, sum, values equal at 1e-9):
dense 2M-turn transcripts 8h/30m (overlap 16) the pane plan is 1.6×
the built-in; 24h/30m (overlap 48) it is 4.1× — the win scales with
the overlap factor. On a tiny sparse table (10k events, ~1 row per
key-pane) it is 0.6× (a second exchange with zero compression is pure
overhead): use it when rows ≫ keys × occupied panes, i.e. exactly the
rollup/dashboard regime it exists for. Float caveat: double sums group
by pane before the window fold, so bit-order differs from the
built-in's row order — equal within normal float tolerance, exact for
int/decimal.

Emission matches the streaming pane operators: one output row per
(key, window) whose half-open span ``[end − size, end)`` contains ≥ 1
input row — empty windows emit nothing (only occupied panes fan out).

Supported aggregates are the distributive/algebraic built-ins whose
partial IS a built-in aggregate: sum, count, max, min, mean
(sum+count partials, divided at the end). Reference parity: these are
the invertible/idempotent monoids of AggregationFunctions.hpp; the
non-decomposable registry monoids take the kernel paths in
:mod:`.batch`.
"""

from __future__ import annotations

import pickle
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIALS = {
    "sum": (F.sum, F.sum),
    "max": (F.max, F.max),
    "min": (F.min, F.min),
    "count": (F.count, F.sum),
}


def pane_rollup(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    value_expr: str = "length(text)",
    agg: str = "sum",
    size: str = "1 hour",
    slide: str = "15 minutes",
    out_col: str = "wagg",
) -> DataFrame:
    """``(size, slide)`` sliding-window aggregate over a batch table via
    the two-stage pane plan (module docstring). Returns
    ``(key, window_start, window_end, out_col)``, one row per nonempty
    window, timestamps in event time.
    """
    from ..streaming.engine import _interval_us

    size_us = _interval_us(size)
    slide_us = _interval_us(slide)
    if size_us % slide_us:
        raise ValueError(
            f"size ({size}) must be a whole multiple of slide ({slide})"
        )
    n_panes = size_us // slide_us
    if agg == "mean":
        partials = [
            F.sum("__v").alias("__ps"),
            F.count("__v").alias("__pc"),
        ]
        finals = [F.sum("__ps").alias("__s"), F.sum("__pc").alias("__c")]
        out_expr = (F.col("__s") / F.col("__c")).alias(out_col)
    elif agg in _PARTIALS:
        part_fn, final_fn = _PARTIALS[agg]
        partials = [part_fn("__v").alias("__p")]
        finals = [final_fn("__p").alias("__f")]
        out_expr = F.col("__f").alias(out_col)
    else:
        raise ValueError(
            f"pane_rollup supports {sorted(_PARTIALS) + ['mean']}; "
            f"got {agg!r} (non-decomposable monoids take the kernel "
            f"paths in operators.batch)"
        )

    # ANSI mode is on: a slide that fits int32 makes F.lit an INT and
    # k * slide_us overflows — force long arithmetic throughout
    slide_l = F.lit(slide_us).cast("long")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pane = (us - F.pmod(us, slide_l)).alias("__pane")
    panes = (
        df.withColumn("__v", F.expr(value_expr))
        .groupBy(F.col(key), pane)
        .agg(*partials)
    )
    fanned = panes.withColumn(
        "__k", F.explode(F.sequence(F.lit(1), F.lit(n_panes)))
    ).withColumn(
        "window_end",
        F.col("__pane") + F.col("__k").cast("long") * slide_l,
    )
    return (
        fanned.groupBy(key, "window_end")
        .agg(*finals)
        .select(
            key,
            F.timestamp_micros(
                F.col("window_end") - F.lit(size_us).cast("long")
            ).alias("window_start"),
            F.timestamp_micros(F.col("window_end")).alias("window_end"),
            out_expr,
        )
    )


def pane_rollup_multi(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    aggs: Sequence[str] = ("sum",),
    value_exprs: Sequence[str] | None = None,
    value_expr: str = "length(text)",
    sizes: Sequence[str] = ("1 hour",),
    slide: str = "15 minutes",
    out_cols: Sequence[str] | None = None,
) -> DataFrame:
    """SHARED-PANE multi-aggregate batch rollup: N aggregates × K window
    sizes over ONE pane layer in ONE single-pass plan — the batch twin
    of :func:`~..streaming.engine.sliding_panes_stream_multi` (slice
    sharing per Scotty, Traub et al. EDBT 2018).

    Stage 1 aggregates every row ONCE into a (key, pane) partial row
    carrying ALL N partials. The fan-out explodes each pane into the
    union of (window_end, size) pairs it feeds — ``Σ_k size_k/slide``
    entries per pane, built as one array-of-struct literal so the plan
    has ONE ``Generate`` and the pane aggregation is still computed
    once (no per-size union re-running stage 1). Stage 2 folds per
    (key, size, window_end). Output matches the streaming multi: one
    row per (key, nonempty window) across all sizes — a row's size is
    ``window_end − window_start`` — with one column per aggregate.

    All sizes must be whole multiples of the shared ``slide``.
    ``value_exprs`` (one per agg) lifts a different input per
    aggregate; defaults to ``value_expr`` for all. ``out_cols``
    defaults to ``w{agg}`` (``w{i}_{agg}`` on duplicates).
    """
    from ..streaming.engine import _interval_us

    slide_us = _interval_us(slide)
    sizes_us = [_interval_us(s) for s in sizes]
    for s_txt, s_us in zip(sizes, sizes_us):
        if s_us % slide_us:
            raise ValueError(
                f"size ({s_txt}) must be a whole multiple of slide ({slide})"
            )
    if len(set(sizes_us)) != len(sizes_us):
        raise ValueError(f"duplicate window sizes: {list(sizes)}")
    if value_exprs is None:
        value_exprs = [value_expr] * len(aggs)
    if len(value_exprs) != len(aggs):
        raise ValueError(
            f"value_exprs ({len(value_exprs)}) must match aggs ({len(aggs)})"
        )
    if out_cols is None:
        names = list(aggs)
        out_cols = [
            f"w{i}_{a}" if names.count(a) > 1 else f"w{a}"
            for i, a in enumerate(names)
        ]
    if len(out_cols) != len(aggs):
        raise ValueError(
            f"out_cols ({len(out_cols)}) must match aggs ({len(aggs)})"
        )

    # one lift column per distinct expression; one partial per distinct
    # (agg-partial, expression) pair — mean contributes sum+count
    expr_col: dict[str, str] = {}
    for e in value_exprs:
        if e not in expr_col:
            expr_col[e] = f"__v{len(expr_col)}"
    partials: dict[tuple[str, str], str] = {}
    finals = []
    outs = []
    for agg, e, oc in zip(aggs, value_exprs, out_cols):
        vcol = expr_col[e]
        if agg == "mean":
            needed = [("sum", vcol), ("count", vcol)]
        elif agg in _PARTIALS:
            needed = [(agg, vcol)]
        else:
            raise ValueError(
                f"pane_rollup_multi supports "
                f"{sorted(_PARTIALS) + ['mean']}; got {agg!r}"
            )
        cols = []
        for part_agg, pv in needed:
            k = (part_agg, pv)
            if k not in partials:
                partials[k] = f"__p{len(partials)}"
            cols.append(partials[k])
        if agg == "mean":
            finals.extend(
                [(F.sum, cols[0], f"__f_{oc}_s"), (F.sum, cols[1],
                                                   f"__f_{oc}_c")]
            )
            outs.append(
                (F.col(f"__f_{oc}_s") / F.col(f"__f_{oc}_c")).alias(oc)
            )
        else:
            _, final_fn = _PARTIALS[agg]
            finals.append((final_fn, cols[0], f"__f_{oc}"))
            outs.append(F.col(f"__f_{oc}").alias(oc))

    slide_l = F.lit(slide_us).cast("long")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pane = (us - F.pmod(us, slide_l)).alias("__pane")
    prepared = df
    for e, c in expr_col.items():
        prepared = prepared.withColumn(c, F.expr(e))
    panes = prepared.groupBy(F.col(key), pane).agg(*[
        _PARTIALS[part_agg][0](pv).alias(pc)
        for (part_agg, pv), pc in partials.items()
    ])
    # one Generate: every (offset, size) pair any size's window needs
    fan = F.array(*[
        F.struct(
            (F.lit(k).cast("long") * slide_l).alias("off"),
            F.lit(s_us).cast("long").alias("size"),
        )
        for s_us in sizes_us
        for k in range(1, s_us // slide_us + 1)
    ])
    fanned = (
        panes.withColumn("__f", F.explode(fan))
        .withColumn("window_end", F.col("__pane") + F.col("__f.off"))
        .withColumn("__size", F.col("__f.size"))
    )
    return (
        fanned.groupBy(key, "__size", "window_end")
        .agg(*[fn(pc).alias(fc) for fn, pc, fc in finals])
        .select(
            key,
            F.timestamp_micros(
                F.col("window_end") - F.col("__size")
            ).alias("window_start"),
            F.timestamp_micros(F.col("window_end")).alias("window_end"),
            *outs,
        )
    )


def pane_rollup_monoid(
    df: DataFrame,
    *,
    key: str = "conv_id",
    ts_col: str = "ts",
    monoids: Sequence[str] = ("sum",),
    value_exprs: Sequence[str] | None = None,
    value_expr: str = "length(text)",
    sizes: Sequence[str] = ("1 hour",),
    slide: str = "15 minutes",
    int_values: bool = False,
) -> DataFrame:
    """Batch shared-pane rollup for ANY commutative registry monoid —
    N monoids × K window sizes over one pane layer, completing the pane
    matrix for the non-Catalyst-native aggregates (hll / cms / top3 /
    toolset / decayed / minhash / …; :func:`pane_rollup_multi` covers
    the distributive built-ins with a pure-Catalyst plan; reference
    parity: any AggregationFunctions.hpp monoid slots into the rollup
    shape, cpp/src/AggregationFunctions.hpp + benchmark_core.h:472-562).

    Plan (one shuffle, two Arrow stages):

    1. **map-side pane pre-combine** — the streaming engine's
       :func:`~..streaming.engine._pane_precombine` verbatim: each
       upstream partition folds its rows into ONE pickled partial per
       (key, pane, spec) with zero shuffle — so the single exchange
       moves pane PARTIALS, not rows, and a Zipf-hot key's serial
       per-key work is O(occupied panes × upstream partitions), not
       O(its rows) ("No pane, no gain", Li et al. 2005 §3).
    2. **per-key window folds** — ``groupBy(key).applyInPandas``:
       concat the blobs, merge to one partial per (pane, spec)
       (interval_fold over pane group boundaries), then fold every
       nonempty window of every size through the disjoint-sparse-table
       interval fold — K sizes cost K fold passes over the SAME pane
       layer, never K ingestion passes (slice sharing per Scotty,
       Traub et al. EDBT 2018).

    Emission matches :func:`pane_rollup_multi` and the streaming
    :func:`~..streaming.engine.sliding_panes_stream_multi`: one row per
    (key, nonempty window) across all sizes (size = ``window_end −
    window_start``), columns ``w{monoid}`` (``w{i}_{monoid}`` on
    duplicates), types per the engine's output-type map. Commutative
    monoids only (cross-partition intra-pane fold order is arbitrary) —
    non-commutative specs raise ValueError, matching the streaming
    ``pre_combine`` contract.
    """
    from ..functions.monoids import get_monoid, p_concat
    from ..operators.batch import _OUT_SPARK_TYPE
    from ..operators.kernels import interval_fold
    from ..streaming.engine import _interval_us, _pane_precombine

    slide_us = _interval_us(slide)
    sizes_us = [_interval_us(s) for s in sizes]
    for s_txt, s_us in zip(sizes, sizes_us):
        if s_us % slide_us:
            raise ValueError(
                f"size ({s_txt}) must be a whole multiple of slide ({slide})"
            )
    if len(set(sizes_us)) != len(sizes_us):
        raise ValueError(f"duplicate window sizes: {list(sizes)}")
    ms = [
        get_monoid(name, np.int64 if int_values else np.float64)
        for name in monoids
    ]
    for m in ms:
        if not m.commutative:
            raise ValueError(
                f"pane_rollup_monoid requires commutative monoids; "
                f"{m.name} is not (non-decomposable/ordered monoids take "
                f"the kernel paths in operators.batch)"
            )
    if value_exprs is None:
        value_exprs = [value_expr] * len(monoids)
    if len(value_exprs) != len(monoids):
        raise ValueError(
            f"value_exprs ({len(value_exprs)}) must match monoids "
            f"({len(monoids)})"
        )
    expr_col: dict[str, str] = {}
    for e in value_exprs:
        if e not in expr_col:
            expr_col[e] = f"__v{len(expr_col)}"
    val_cols = [expr_col[e] for e in value_exprs]
    names = list(monoids)
    out_cols = [
        f"w{i}_{n}" if names.count(n) > 1 else f"w{n}"
        for i, n in enumerate(names)
    ]
    int_flags = [int_values] * len(ms)
    key_t = df.schema[key].dataType.simpleString()
    out_schema = ", ".join(
        [f"{key} {key_t}", "window_start timestamp", "window_end timestamp"]
        + [f"{c} {_OUT_SPARK_TYPE[n]}" for c, n in zip(out_cols, names)]
    )

    def fold_key(key_tuple, pdf):
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        pane = ts - ts % slide_us
        order = np.argsort(pane, kind="mergesort")
        pane = pane[order]
        loaded = [pickle.loads(bytes(b)) for b in pdf["__pre"].to_numpy()[order]]
        stacked = [
            p_concat(*[row[i] for row in loaded]) for i in range(len(ms))
        ]
        change = np.flatnonzero(np.diff(pane)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(pane)]))
        pane_ts = pane[starts]
        partials = [
            interval_fold(m, sp, starts, ends) for m, sp in zip(ms, stacked)
        ]
        frames = []
        for size_us in sizes_us:
            n_panes = size_us // slide_us
            # candidate ends come from the occupied panes (a long quiet
            # gap never enumerates); empty windows emit nothing
            cand = np.unique(
                (
                    pane_ts[:, None]
                    + np.arange(1, n_panes + 1, dtype=np.int64) * slide_us
                ).ravel()
            )
            lo = np.searchsorted(pane_ts, cand - size_us, side="left")
            hi = np.searchsorted(pane_ts, cand, side="left")
            nz = lo < hi
            cand, lo, hi = cand[nz], lo[nz], hi[nz]
            if not len(cand):
                continue
            frame = {
                key: key_tuple[0],
                "window_start": (cand - size_us).astype("datetime64[us]"),
                "window_end": cand.astype("datetime64[us]"),
            }
            for c, m, sp in zip(out_cols, ms, partials):
                frame[c] = m.lower(interval_fold(m, sp, lo, hi))
            frames.append(pd.DataFrame(frame))
        if not frames:  # unreachable (any row occupies a pane) — Arrow-safe
            return pd.DataFrame({
                key: pdf[key].iloc[0:0],
                "window_start": pd.Series(dtype="datetime64[us]"),
                "window_end": pd.Series(dtype="datetime64[us]"),
                **{c: pd.Series(dtype=np.float64) for c in out_cols},
            })
        return pd.concat(frames, ignore_index=True)

    prepared = df
    for e, c in expr_col.items():
        prepared = prepared.withColumn(c, F.expr(e))
    prepared = prepared.select(key, ts_col, *expr_col.values())
    prepared = _pane_precombine(
        prepared, key=key, ts_col=ts_col, val_cols=val_cols,
        monoids=ms, int_flags=int_flags, slide_us=slide_us,
    )
    return prepared.groupBy(key).applyInPandas(fold_key, out_schema)
