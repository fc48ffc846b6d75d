"""Stateful stream-stream interval join: user turns against the
assistant/tool turns that answer them (north_rule requirement; fixture
semantics in FIXTURES.md §F7 — no reference counterpart to cite).

Built entirely from Spark's watermarked stream-stream join machinery:
both sides carry watermarks, and the join condition bounds the assistant
turn's event time to [user_ts, user_ts + horizon] so state on both sides
is provably expirable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_assistant_join(
    turns: DataFrame,
    *,
    horizon: str = "60 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Join each user turn to every assistant/tool turn of the same
    conversation within ``horizon`` after it."""
    users = (
        turns.where(F.col("role") == "user")
        .select(
            F.col("conv_id").alias("u_conv"),
            F.col("turn_idx").alias("u_turn"),
            F.col("ts").alias("u_ts"),
            F.col("text").alias("u_text"),
        )
        .withWatermark("u_ts", watermark)
    )
    replies = (
        turns.where(F.col("role").isin("assistant", "tool"))
        .select(
            F.col("conv_id").alias("r_conv"),
            F.col("turn_idx").alias("r_turn"),
            F.col("role").alias("r_role"),
            F.col("tool").alias("r_tool"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
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


def user_assistant_join_batch(turns: DataFrame, horizon: str = "60 seconds") -> DataFrame:
    """The batch twin of :func:`user_assistant_join` (same plan minus
    watermarks) — used for differential testing of the streaming output."""
    users = turns.where(F.col("role") == "user").select(
        F.col("conv_id").alias("u_conv"), F.col("turn_idx").alias("u_turn"),
        F.col("ts").alias("u_ts"), F.col("text").alias("u_text"),
    )
    replies = turns.where(F.col("role").isin("assistant", "tool")).select(
        F.col("conv_id").alias("r_conv"), F.col("turn_idx").alias("r_turn"),
        F.col("role").alias("r_role"), F.col("tool").alias("r_tool"),
        F.col("ts").alias("r_ts"),
    )
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
