"""Stateful stream-stream interval join: user turns against the
assistant/tool turns that answer them (north_rule requirement; fixture
semantics in FIXTURES.md §F7 — no reference counterpart to cite).

Built entirely from Spark's watermarked stream-stream join machinery:
both sides carry watermarks, and the join condition bounds the assistant
turn's event time to [user_ts, user_ts + horizon] so state on both sides
is provably expirable.

Two shapes:

- :func:`user_assistant_join` — EVERY reply inside the horizon (the raw
  interval join; one row per (user turn, reply) pair);
- :func:`user_next_reply` — §F7's semantics proper: each user turn joined
  to its FIRST reply only (interval join → per-user-turn min-by, a second
  stateful operator chained after the join).

Each has a batch twin built from the same plan builder (the streaming
variant only adds watermarks), so differential tests compare one plan,
not two hand-copies. The user's ``text`` column is deliberately NOT
carried through the join: every projected column of both sides lives in
the stream-stream join state for the full watermark horizon, and text is
the dominant column width — join on the narrow keys, re-join text later
if a consumer needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_join(
    turns: DataFrame, horizon: str, watermark: str | None
) -> DataFrame:
    """Shared plan: user turns ⋈ replies within [u_ts, u_ts + horizon].
    ``watermark=None`` builds the batch twin (same plan, no watermarks)."""
    users = turns.where(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("u_turn"),
        F.col("ts").alias("u_ts"),
    )
    replies = turns.where(F.col("role").isin("assistant", "tool")).select(
        F.col("conv_id").alias("r_conv"),
        F.col("turn_idx").alias("r_turn"),
        F.col("role").alias("r_role"),
        F.col("tool").alias("r_tool"),
        F.col("ts").alias("r_ts"),
    )
    if watermark is not None:
        users = users.withWatermark("u_ts", watermark)
        replies = replies.withWatermark("r_ts", watermark)
    cond = (
        (users.u_conv == replies.r_conv)
        & (replies.r_ts >= users.u_ts)
        & (replies.r_ts <= F.col("u_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return users.join(replies, cond, "inner").select(
        F.col("u_conv").alias("conv_id"),
        F.col("u_turn").alias("user_turn"),
        "u_ts",
        F.col("r_turn").alias("reply_turn"),
        "r_role",
        "r_tool",
        "r_ts",
    )


def user_assistant_join(
    turns: DataFrame,
    *,
    horizon: str = "60 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Join each user turn to EVERY assistant/tool turn of the same
    conversation within ``horizon`` after it (the raw interval join)."""
    return _interval_join(turns, horizon, watermark)


def user_assistant_join_batch(turns: DataFrame, horizon: str = "60 seconds") -> DataFrame:
    """The batch twin of :func:`user_assistant_join` (same plan minus
    watermarks) — used for differential testing of the streaming output."""
    return _interval_join(turns, horizon, None)


def _first_reply(joined: DataFrame) -> DataFrame:
    """Per user turn, keep only the earliest reply — ties on r_ts broken
    by reply turn_idx so the result is deterministic."""
    return joined.groupBy("conv_id", "user_turn", "u_ts").agg(
        F.min_by(
            F.struct("reply_turn", "r_role", "r_tool", "r_ts"),
            F.struct("r_ts", "reply_turn"),
        ).alias("r")
    ).select(
        "conv_id",
        "user_turn",
        "u_ts",
        F.col("r.reply_turn").alias("reply_turn"),
        F.col("r.r_role").alias("r_role"),
        F.col("r.r_tool").alias("r_tool"),
        F.col("r.r_ts").alias("r_ts"),
    )


def user_next_reply(
    turns: DataFrame,
    *,
    horizon: str = "60 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """FIXTURES.md §F7 semantics: each user turn joined to its NEXT
    assistant/tool reply within the horizon (one row per answered user
    turn). Streaming shape: interval join → per-user-turn min-by — two
    chained stateful operators, both expirable under the watermark."""
    return _first_reply(_interval_join(turns, horizon, watermark))


def user_next_reply_batch(turns: DataFrame, horizon: str = "60 seconds") -> DataFrame:
    """Batch twin of :func:`user_next_reply`."""
    return _first_reply(_interval_join(turns, horizon, None))


# ---------------------------------------------------------------------------
# Reply-latency rollup: the north_rule's full pipeline composed end-to-end —
# stream-stream interval join → first-reply min-by → tumbling windowed
# aggregate — THREE chained stateful operators in ONE streaming query
# (Spark 3.5+ multi-stateful-operator watermark propagation).


def _latency_rows(first_reply: DataFrame) -> DataFrame:
    """Per answered user turn: its event time and reply latency in exact
    integer microseconds (unix_micros keeps the arithmetic in int64 — the
    module-wide determinism discipline, no float timestamps)."""
    return first_reply.select(
        "u_ts",
        (F.unix_micros("r_ts") - F.unix_micros("u_ts")).alias("lat_us"),
    )


def reply_latency_stream(
    turns: DataFrame,
    *,
    horizon: str = "60 seconds",
    watermark: str = "2 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Per tumbling ``window``: count / sum / max of user→first-reply
    latency, computed as ONE streaming query chaining three stateful
    operators (interval join, first-reply min-by, windowed agg). Output
    columns ``(win_start, answered, sum_lat_us, max_lat_us)``; windows
    finalize in append mode when the watermark passes their end."""
    lat = _latency_rows(user_next_reply(turns, horizon=horizon, watermark=watermark))
    return (
        lat.groupBy(F.window("u_ts", window))
        .agg(
            F.count("*").alias("answered"),
            F.sum("lat_us").alias("sum_lat_us"),
            F.max("lat_us").alias("max_lat_us"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "answered",
            "sum_lat_us",
            "max_lat_us",
        )
    )


def reply_latency_batch(
    turns: DataFrame, horizon: str = "60 seconds", window: str = "1 hour"
) -> DataFrame:
    """Batch twin of :func:`reply_latency_stream`, plus exact discrete
    p50/p90 latencies. The percentile is the order statistic at 1-based
    index ``(n-1)*q div 1/q`` computed in INTEGER arithmetic
    (``(n-1) div 2`` / ``(n-1)*9 div 10``) so DuckDB reproduces the same
    element with no IEEE754 quantile-interpolation ambiguity."""
    from pyspark.sql import Window as W

    lat = _latency_rows(user_next_reply_batch(turns, horizon)).select(
        F.window("u_ts", window).getField("start").alias("win_start"), "lat_us"
    )
    ranked = lat.select(
        "win_start",
        "lat_us",
        F.row_number()
        .over(W.partitionBy("win_start").orderBy("lat_us"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("win_start")).alias("n"),
    )
    return (
        ranked.groupBy("win_start")
        .agg(
            F.count("*").alias("answered"),
            F.sum("lat_us").alias("sum_lat_us"),
            F.max("lat_us").alias("max_lat_us"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n - 1) div 2") + F.lit(1),
                    F.col("lat_us"),
                )
            ).alias("p50_lat_us"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("((n - 1) * 9) div 10") + F.lit(1),
                    F.col("lat_us"),
                )
            ).alias("p90_lat_us"),
        )
    )
