"""Deterministic conversation-transcript synthesizer (the BASELINE
input_hint table): ``(conv_id string, turn_idx int32, role string,
text string, tool string, ts timestamp)``.

Mirrors FIXTURES.md §F1: Zipf(s=1.2) assignment of turns to conversations
(hot-key skew), role cycle with P(tool)=0.15, and
``len(text) = 1 + (i % 101)`` where i is the global turn counter — the
reference's synthetic value stream (cpp/src/benchmark_core.h:115) — so
windowed sums/maxes over ``length(text)`` reproduce the reference's
aggregate sequences exactly.

Two generators:

- :func:`transcripts_pandas` — seeded NumPy, for unit tests and kernels.
- :func:`transcripts_spark`  — pure DataFrame expressions over
  ``spark.range(n)`` (no driver-side materialization), for benchmarks at
  scale: the same rows, derived from the same integer recurrences, so a
  100×-larger stream costs no driver memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS = np.datetime64("2024-01-01T00:00:00")
TOOLS = [
    "search", "calculator", "browser", "python",
    "sql", "files", "email", "scheduler",
]
_ROLES = ["user", "assistant", "tool"]
_TEXT_BLOCK = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua " * 2
)


# multiplicative-hash constants; products stay < 2^63 for i < ~4e9, so the
# identical signed-64 arithmetic runs in NumPy int64 and Spark LONG (ANSI-safe)
_ZIPF_MULT = 2654435761
_ROLE_MULT = 2246822519
_ZIPF_S = 1.2
# the ONE exponent both generators raise (1-u) to: computing -1/(s-1) in
# Python and hard-coding -5.0 in SQL yields two doubles that differ in the
# last ulp and disagree on floor() for ~1.8k of the 1e6 u values
_ZIPF_EXP = -1.0 / (_ZIPF_S - 1.0)


def _zipf_conv(i: np.ndarray, n_convs: int, s: float = _ZIPF_S) -> np.ndarray:
    """Deterministic Zipf-ish conversation assignment: turn i → conv via a
    multiplicative hash mapped through the Zipf inverse CDF
    (rank ∝ u^(-1/(s-1)) truncated to n_convs). Pure integer/float math —
    identical in the Spark generator."""
    u = ((i * _ZIPF_MULT) % 1_000_003).astype(np.float64) / 1_000_003.0  # [0,1)
    rank = np.floor(np.power(1.0 - u, -1.0 / (s - 1.0))) - 1.0  # == _ZIPF_EXP at the default s
    return np.minimum(rank, n_convs - 1).astype(np.int64)


def _role_draw(i: np.ndarray) -> np.ndarray:
    """user/assistant alternate; a turn becomes 'tool' when a deterministic
    hash says so with P≈0.15."""
    tool = ((i * _ROLE_MULT) % 100) < 15
    alt = np.where(i % 2 == 0, 0, 1)  # user / assistant
    return np.where(tool, 2, alt)


def transcripts_pandas(n_turns: int, n_convs: int = 100, ooo_distance: int = 0,
                       ooo_every: int = 0) -> pd.DataFrame:
    """Deterministic transcript rows, optionally with out-of-order ts.

    ``ooo_every > 0`` shifts every k-th row's ts back by ``ooo_distance``
    seconds (FIXTURES.md §F4 deterministic-subset variant).
    """
    i = np.arange(n_turns, dtype=np.int64)
    conv = _zipf_conv(i, n_convs)
    role_idx = _role_draw(i)
    lens = 1 + (i % 101)
    text = np.array([_TEXT_BLOCK[: int(L)] for L in lens], dtype=object)
    tool = np.where(
        role_idx == 2,
        np.array(TOOLS, dtype=object)[(i % len(TOOLS)).astype(int)],
        None,
    )
    ts_off = i.copy()
    if ooo_every > 0:
        late = (i % ooo_every) == (ooo_every - 1)
        ts_off = np.where(late, np.maximum(i - ooo_distance, 0), i)
    # dense per-conv turn_idx in ARRIVAL (generation) order — under the
    # OOO variants a row's ts can precede its predecessors' while its
    # turn_idx stays later; that inversion is exactly what the OOO tests
    # need (turn_idx is the stable total order, ts is the event time)
    df = pd.DataFrame(
        {
            "conv_id": np.char.add("conv", np.char.zfill(conv.astype(str), 6)),
            "role": np.array(_ROLES, dtype=object)[role_idx],
            "text": text,
            "tool": tool,
            "ts": BASE_TS + ts_off.astype("timedelta64[s]"),
            "_i": i,
        }
    )
    df["turn_idx"] = df.groupby("conv_id")["_i"].rank(method="first").astype(np.int32) - 1
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def transcripts_spark(spark, n_turns: int, n_convs: int = 100):
    """The same table as :func:`transcripts_pandas`, built with DataFrame
    expressions over ``spark.range`` — fully distributed synthesis (no
    collect, no Python UDF): this is how the 10^12-turn stream would be
    mocked on a real cluster."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.range(n_turns).withColumnRenamed("id", "i")
    df = df.withColumn(
        "_u", F.expr(f"cast((i * {_ZIPF_MULT}L) % 1000003 as double) / 1000003.0")
    )
    # clamp the double before floor→long so ANSI mode can't overflow
    df = df.withColumn(
        "_conv",
        F.least(
            F.floor(F.least(F.pow(1.0 - F.col("_u"), F.lit(_ZIPF_EXP)), F.lit(9.0e18))) - 1,
            F.lit(n_convs - 1),
        ).cast("long"),
    )
    df = df.withColumn(
        "role",
        F.when(F.expr(f"(i * {_ROLE_MULT}L) % 100 < 15"), F.lit("tool")
        ).when(F.col("i") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")),
    )
    tools_arr = F.array(*[F.lit(t) for t in TOOLS])
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.element_at(tools_arr, (F.col("i") % len(TOOLS)).cast("int") + 1),
        ),
    )
    df = df.withColumn("_len", (1 + F.col("i") % 101).cast("int"))
    df = df.withColumn("text", F.substring(F.lit(_TEXT_BLOCK), 1, 101))
    df = df.withColumn("text", F.expr("substring(text, 1, _len)"))
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp(F.lit("2024-01-01 00:00:00")) + F.col("i"))
    )
    df = df.withColumn(
        # %06d pads but never truncates — lpad(…, 6) would cut conversation
        # numbers above 999999 to their first six digits (id collisions),
        # while the pandas twin's zfill leaves them intact
        "conv_id", F.format_string("conv%06d", F.col("_conv"))
    )
    w = Window.partitionBy("conv_id").orderBy("i")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
