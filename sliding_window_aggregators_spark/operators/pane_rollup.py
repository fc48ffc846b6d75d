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
