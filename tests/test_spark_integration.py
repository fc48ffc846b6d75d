"""End-to-end Spark integration: kernels through applyInPandas vs Spark's
own SQL windows on the transcripts table, plus a sample of the driver
queries vs their DuckDB oracles at sf0.001."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators import SlidingCountWindow
from sliding_window_aggregators_spark.operators.batch import sliding_rows_kernel
from sliding_window_aggregators_spark.sources import transcripts_pandas, transcripts_spark

SF_DIR = os.environ.get("SWAG_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def transcripts(spark):
    return transcripts_spark(spark, 5000, 100).withColumn(
        "len", F.length("text")
    ).cache()


@pytest.mark.parametrize("w", [4, 100])
def test_kernel_vs_sql_window_on_transcripts(spark, transcripts, w):
    """The M1 triangle (SURVEY.md §7): count-based sliding sum of text
    length per conversation, kernel vs Window.rowsBetween — same rows."""
    got = sliding_rows_kernel(
        transcripts, "conv_id", ["ts", "turn_idx"], "len", "sum", w,
        out="wsum", id_cols=["conv_id", "turn_idx"], int_values=True,
    )
    win = (
        Window.partitionBy("conv_id").orderBy("ts", "turn_idx").rowsBetween(-(w - 1), 0)
    )
    exp = transcripts.select(
        "conv_id", "turn_idx", F.sum("len").over(win).alias("wsum")
    )
    g = got.alias("g")
    e = exp.alias("e")
    n_bad = (
        g.join(e, ["conv_id", "turn_idx"])
        .where("g.wsum <> e.wsum")
        .count()
    )
    assert n_bad == 0
    assert got.count() == 5000


def test_per_turn_text_equality_under_stable_ordering(spark, transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after a kernel round trip."""
    def ident(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx"], kind="mergesort")
        k = SlidingCountWindow(get_monoid("count"), 10)
        pdf = pdf.copy()
        pdf["wcount"] = k.process(pdf["turn_idx"].to_numpy()).astype("int64")
        return pdf[["conv_id", "turn_idx", "text", "wcount"]]

    out = (
        transcripts.groupBy("conv_id")
        .applyInPandas(ident, "conv_id string, turn_idx int, text string, wcount long")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = (
        transcripts.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == src["text"].tolist()
    assert (out.groupby("conv_id")["wcount"].max() <= 10).all()


QUERY_SAMPLE = [
    "kernel_sum_w100",
    "kernel_stats_w100",
    "session_30m",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
]


@pytest.mark.parametrize("name", QUERY_SAMPLE)
def test_driver_queries_vs_duckdb(spark, name):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from tools.check_oracles import compare, duck_con

    con = duck_con(SF_DIR)
    sdf = entry.queries()[name](spark, SF_DIR)
    assert compare(name, sdf, con, entry.oracle_sql()[name])


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() > 0


def test_sliding_rows_auto_paths_agree(spark, transcripts):
    """The dispatcher's two physical paths must be result-equal: for a
    SQL-expressible monoid the auto route is a native Window frame (no
    Python stage); for the rest it is the partitioned kernel. Both are
    checked against each other on the same input."""
    from sliding_window_aggregators_spark.operators.batch import (
        sliding_rows_auto,
        sliding_rows_kernel_partitioned,
    )

    args = ("conv_id", ["ts", "turn_idx"], "len", 10)
    a = sliding_rows_auto(
        transcripts, args[0], args[1], args[2], "sum", args[3],
        out="w", id_cols=["conv_id", "turn_idx"], int_values=True,
    )
    b = sliding_rows_kernel_partitioned(
        transcripts, args[0], args[1], args[2], "sum", args[3],
        out="w", id_cols=["conv_id", "turn_idx"], int_values=True,
    )
    # SQL path emits double for sum; align types before compare
    n_bad = (
        a.select("conv_id", "turn_idx", F.col("w").cast("long").alias("w")).alias("a")
        .join(b.alias("b"), ["conv_id", "turn_idx"])
        .where("a.w <> b.w")
        .count()
    )
    assert n_bad == 0
    # SQL-expressible monoid → no Python stage in the plan
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
    # non-SQL monoid → kernel route
    c = sliding_rows_auto(
        transcripts, args[0], args[1], args[2], "mincount", args[3],
        out="w", id_cols=["conv_id", "turn_idx"], int_values=True,
    )
    assert "MapInPandas" in c._jdf.queryExecution().executedPlan().toString()
    # the path pin: "kernel" forces MapInPandas even for a SQL monoid;
    # "sql" for a monoid with no native Window form must refuse, and an
    # unknown pin must refuse
    d = sliding_rows_auto(
        transcripts, args[0], args[1], args[2], "sum", args[3],
        out="w", id_cols=["conv_id", "turn_idx"], int_values=True,
        path="kernel",
    )
    assert "MapInPandas" in d._jdf.queryExecution().executedPlan().toString()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no native SQL window form"):
        sliding_rows_auto(
            transcripts, args[0], args[1], args[2], "mincount", args[3],
            out="w", id_cols=["conv_id", "turn_idx"], int_values=True,
            path="sql",
        )
    with _pytest.raises(ValueError, match="unknown path"):
        sliding_rows_auto(
            transcripts, args[0], args[1], args[2], "sum", args[3],
            out="w", id_cols=["conv_id", "turn_idx"], int_values=True,
            path="bogus",
        )


def test_chunked_halo_hot_key_parallel_matches_sql(spark):
    """The hot-key answer (north_rule salting analogue): ONE giant key
    through the chunked-halo decomposition must equal the plain SQL
    window, while actually splitting the key into many independent
    (key, chunk) tasks."""
    from sliding_window_aggregators_spark.operators.batch import (
        sliding_rows_kernel_parallel,
        sliding_rows_kernel_partitioned,
    )

    n, w, chunk = 40_000, 257, 4096
    df = (
        spark.range(n)
        .select(
            F.lit("hot-conv").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            (F.col("id") % 101 + 1).cast("long").alias("v"),
        )
        .cache()
    )
    got = sliding_rows_kernel_parallel(
        df, "conv_id", "turn_idx", "v", "sum", w,
        out="ws", chunk=chunk, id_cols=["conv_id", "turn_idx"], int_values=True,
    )
    win = (
        Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(-(w - 1), 0)
    )
    exp = df.select("conv_id", "turn_idx", F.sum("v").over(win).alias("ws"))
    n_bad = (
        got.withColumn("ws", F.col("ws").cast("long")).alias("g")
        .join(exp.alias("e"), ["conv_id", "turn_idx"])
        .where("g.ws <> e.ws")
        .count()
    )
    assert n_bad == 0
    assert got.count() == n
    # the same shape through the partitioned route's chunk parameter
    got2 = sliding_rows_kernel_partitioned(
        df, "conv_id", ["turn_idx"], "v", "sum", w,
        out="ws", chunk=chunk, id_cols=["conv_id", "turn_idx"], int_values=True,
    )
    n_bad2 = (
        got2.withColumn("ws", F.col("ws").cast("long")).alias("g")
        .join(exp.alias("e"), ["conv_id", "turn_idx"])
        .where("g.ws <> e.ws")
        .count()
    )
    assert n_bad2 == 0 and got2.count() == n


def test_generator_parity_pandas_vs_spark(spark):
    """The two synthesizers must emit row-identical tables (the Spark twin
    derives every column from the same integer recurrences — including the
    SHARED Zipf exponent constant; a hand-inlined -5.0 differed from
    -1/(s-1) in the last ulp and flipped floor() on ~1.8k of 1e6 hash
    values)."""
    a = (
        transcripts_pandas(8000, 500)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        transcripts_spark(spark, 8000, 500)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for col in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        assert a[col].fillna("∅").tolist() == b[col].fillna("∅").tolist(), col


def test_w16384_cross_batch_carry_small_arrow_batches(spark):
    """The w=16384 driver query's load-bearing claim: the partitioned
    kernel's cross-batch carry is exact when the window spans MANY Arrow
    batches (w ≫ maxRecordsPerBatch). Forcing 512-row batches makes every
    event_type group span ~dozens of batches at sf0.001; answers must
    equal the native SQL window bit-for-bit."""
    from sliding_window_aggregators_spark.plans.events_queries import (
        W_LAT,
        q_kernel_sum_w16384,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "512")
    try:
        got = q_kernel_sum_w16384(spark, SF_DIR)
        from sliding_window_aggregators_spark.operators.batch import with_cents

        df = with_cents(spark.read.parquet(f"{SF_DIR}/events.parquet"))
        win = (
            Window.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(-(W_LAT - 1), 0)
        )
        exp = df.select(
            "event_type",
            "event_id",
            F.sum("cents").over(win).cast("long").alias("wsum16k_cents"),
        )
        n_bad = (
            got.alias("g")
            .join(exp.alias("e"), ["event_type", "event_id"])
            .where("g.wsum16k_cents <> e.wsum16k_cents")
            .count()
        )
        assert n_bad == 0
        assert got.count() == exp.count()
    finally:
        spark.conf.set(key, prev)
