"""Batch pane rollup (`pane_rollup`): the pure-Catalyst two-stage
(size, slide) sliding-window plan — pane partials, then pane→window
fan-out — versus three independent oracles: Spark's own built-in
`F.window` explosion plan, a pandas brute recompute, and DuckDB. Plus
the 100 TB plan pins: zero Python nodes, aggregation before the
fan-out `Generate`, two hash exchanges.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sliding_window_aggregators_spark.operators import pane_rollup
from sliding_window_aggregators_spark.sources import transcripts_pandas

US = 1_000_000
SLIDE = 60 * US
SIZE = 4 * SLIDE


def _got(df):
    return (
        df.selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            "wagg",
        )
        .toPandas()
        .sort_values(["conv_id", "we"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("agg,expr,fold", [
    ("sum", "length(text)", np.sum),
    ("max", "cast(turn_idx as double)", np.max),
    ("min", "cast(turn_idx as double)", np.min),
    ("count", "1", len),
    ("mean", "length(text)", np.mean),
])
def test_pane_rollup_matches_brute(spark, agg, expr, fold):
    pdf = transcripts_pandas(1500, 24)
    df = spark.createDataFrame(pdf)
    got = _got(pane_rollup(
        df, agg=agg, value_expr=expr, size="4 minutes", slide="1 minute",
    ))
    rows = []
    for conv, g in pdf.groupby("conv_id"):
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if expr == "length(text)":
            vals = g["text"].str.len().to_numpy().astype(np.float64)
        elif expr == "1":
            vals = np.ones(len(g))
        else:
            vals = g["turn_idx"].to_numpy().astype(np.float64)
        panes = ts - ts % SLIDE
        ends = {int(p + k * SLIDE) for p in np.unique(panes)
                for k in range(1, SIZE // SLIDE + 1)}
        for e in sorted(ends):
            m = (ts >= e - SIZE) & (ts < e)
            if m.any():
                rows.append((conv, e - SIZE, e, float(fold(vals[m]))))
    exp = pd.DataFrame(rows, columns=["conv_id", "ws", "we", "wagg"])
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wagg"].to_numpy() == pytest.approx(
        exp["wagg"].to_numpy(), rel=1e-12
    )


def test_pane_rollup_matches_builtin_window(spark):
    """Same emission set and values as Spark's own F.window explosion
    plan — the built-in is the semantic oracle, the pane plan is the
    O(rows + panes x overlap) replacement for its O(rows x overlap)."""
    pdf = transcripts_pandas(2000, 30)
    df = spark.createDataFrame(pdf)
    got = _got(pane_rollup(
        df, agg="sum", size="4 minutes", slide="1 minute",
    ))
    builtin = (
        df.groupBy(
            "conv_id", F.window("ts", "4 minutes", "1 minute").alias("w")
        )
        .agg(F.sum(F.length("text")).alias("wagg"))
        .select(
            "conv_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "wagg",
        )
    )
    exp = _got(builtin)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()


def test_pane_rollup_vs_duckdb(spark, tmp_path):
    """Cross-engine value oracle (the pytest-level pattern for queries
    outside the 50-slot driver registry)."""
    import duckdb

    pdf = transcripts_pandas(2000, 30)
    src = str(tmp_path / "rows.parquet")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    got = _got(pane_rollup(
        spark.read.parquet(src), agg="sum",
        size="4 minutes", slide="1 minute",
    ))
    exp = duckdb.connect().execute(f"""
        with rows as (
          select conv_id, ts, cast(length(text) as double) v
          from read_parquet('{src}/*.parquet')
        ),
        panes as (
          select conv_id,
                 (epoch_us(ts) // {SLIDE}) * {SLIDE} as p,
                 sum(v) as s
          from rows group by 1, 2
        ),
        contrib as (
          select conv_id, p + k.range * {SLIDE} as we, s
          from panes, range(1, {SIZE // SLIDE} + 1) k
        )
        select conv_id, we - {SIZE} as ws, we, sum(s) as wagg
        from contrib group by 1, 2, 3 order by 1, 3
    """).df()
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()


def test_pane_rollup_plan_is_pure_codegen(spark):
    """100 TB pins: no Python/Arrow nodes anywhere; the fan-out
    `Generate` (explode) sits ABOVE a HashAggregate — rows are
    aggregated to panes BEFORE the overlap-factor explosion, the whole
    point of the plan; exactly two hash exchanges (pane agg + window
    agg)."""
    pdf = transcripts_pandas(200, 8)
    df = spark.createDataFrame(pdf)
    out = pane_rollup(df, size="4 minutes", slide="1 minute")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEval",
                "BatchEvalPython", "PythonUDF"):
        assert bad not in plan, plan
    assert "Generate explode" in plan, plan
    gen = plan.index("Generate explode")
    # below-the-Generate suffix of the tree = the pane aggregation side;
    # it must already contain a HashAggregate (explosion sees partials)
    assert "HashAggregate" in plan[gen:], plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_pane_rollup_long_arithmetic_under_ansi(spark):
    """Regression: a slide that fits int32 (30m = 1.8e9 us) made F.lit
    an INT, and k x slide overflowed under Spark 4's ANSI mode once
    k x slide > 2^31 (any size >= ~36 minutes at that slide). Force-long
    arithmetic must survive the worst int32-adjacent config."""
    pdf = transcripts_pandas(300, 6)
    df = spark.createDataFrame(pdf)
    out = pane_rollup(df, size="8 hours", slide="30 minutes")
    assert out.count() >= 0  # executing the plan is the assertion


def test_pane_rollup_rejects_bad_args(spark):
    pdf = transcripts_pandas(50, 4)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="multiple"):
        pane_rollup(df, size="5 minutes", slide="2 minutes")
    with pytest.raises(ValueError, match="pane_rollup supports"):
        pane_rollup(df, agg="mincount", size="4 minutes", slide="1 minute")

# ---------------------------------------------------------------------------
# pane_rollup_multi: N aggregates x K sizes over ONE shared pane layer
# ---------------------------------------------------------------------------

def test_pane_rollup_multi_matches_single_per_size(spark):
    """The shared-pane multi must equal K x N independent single
    rollups: for each size, the multi rows of that span carry exactly
    the single plan's windows and values — with HETEROGENEOUS per-agg
    value lifts (sum over text length, max over turn_idx)."""
    from sliding_window_aggregators_spark.operators import pane_rollup_multi

    pdf = transcripts_pandas(1500, 24)
    df = spark.createDataFrame(pdf)
    sizes = ("4 minutes", "8 minutes")
    multi = (
        pane_rollup_multi(
            df,
            aggs=("sum", "max", "mean"),
            value_exprs=(
                "length(text)",
                "cast(turn_idx as double)",
                "length(text)",
            ),
            sizes=sizes,
            slide="1 minute",
        )
        .selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            "wsum", "wmax", "wmean",
        )
        .toPandas()
        .sort_values(["conv_id", "we"])
    )
    for size_txt, size_us in zip(sizes, (4 * 60 * US, 8 * 60 * US)):
        part = (
            multi[multi["we"] - multi["ws"] == size_us]
            .reset_index(drop=True)
        )
        for agg, expr, col in [
            ("sum", "length(text)", "wsum"),
            ("max", "cast(turn_idx as double)", "wmax"),
            ("mean", "length(text)", "wmean"),
        ]:
            single = _got(pane_rollup(
                df, agg=agg, value_expr=expr,
                size=size_txt, slide="1 minute",
            ))
            assert part["conv_id"].tolist() == single["conv_id"].tolist()
            assert part["ws"].tolist() == single["ws"].tolist()
            assert part["we"].tolist() == single["we"].tolist()
            assert part[col].to_numpy() == pytest.approx(
                single["wagg"].to_numpy(), rel=1e-12
            )


def test_pane_rollup_multi_plan_single_pass(spark):
    """The whole point of the shared layer: K sizes x N aggs must cost
    ONE pane aggregation and ONE fan-out — exactly one Generate, two
    hash exchanges, zero Python nodes, pane HashAggregate below the
    Generate. A per-size union would show K Generates / 2K exchanges."""
    from sliding_window_aggregators_spark.operators import pane_rollup_multi

    pdf = transcripts_pandas(200, 8)
    df = spark.createDataFrame(pdf)
    out = pane_rollup_multi(
        df,
        aggs=("sum", "max", "mean", "count"),
        value_exprs=("length(text)", "cast(turn_idx as double)",
                     "length(text)", "1"),
        sizes=("4 minutes", "8 minutes", "12 minutes"),
        slide="1 minute",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEval",
                "BatchEvalPython", "PythonUDF"):
        assert bad not in plan, plan
    assert plan.count("Generate explode") == 1, plan
    gen = plan.index("Generate explode")
    assert "HashAggregate" in plan[gen:], plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_pane_rollup_multi_dedup_out_cols_and_long_arith(spark):
    """Duplicate agg names get positional out_cols; int32-adjacent
    slide (30m) with multi-hour sizes must survive ANSI long
    arithmetic (same regression class as the single rollup)."""
    from sliding_window_aggregators_spark.operators import pane_rollup_multi

    pdf = transcripts_pandas(300, 6)
    df = spark.createDataFrame(pdf)
    out = pane_rollup_multi(
        df,
        aggs=("sum", "sum"),
        value_exprs=("length(text)", "turn_idx"),
        sizes=("8 hours", "24 hours"),
        slide="30 minutes",
    )
    assert out.columns[-2:] == ["w0_sum", "w1_sum"]
    assert out.count() > 0


def test_pane_rollup_multi_rejects_bad_args(spark):
    from sliding_window_aggregators_spark.operators import pane_rollup_multi

    pdf = transcripts_pandas(50, 4)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="multiple"):
        pane_rollup_multi(df, sizes=("5 minutes",), slide="2 minutes")
    with pytest.raises(ValueError, match="duplicate"):
        pane_rollup_multi(df, sizes=("4 minutes", "4 minutes"),
                          slide="1 minute")
    with pytest.raises(ValueError, match="value_exprs"):
        pane_rollup_multi(df, aggs=("sum", "max"),
                          value_exprs=("length(text)",),
                          sizes=("4 minutes",), slide="1 minute")
    with pytest.raises(ValueError, match="out_cols"):
        pane_rollup_multi(df, aggs=("sum",), out_cols=("a", "b"),
                          sizes=("4 minutes",), slide="1 minute")
    with pytest.raises(ValueError, match="supports"):
        pane_rollup_multi(df, aggs=("mincount",),
                          sizes=("4 minutes",), slide="1 minute")

# ---------------------------------------------------------------------------
# pane_rollup_monoid: the batch shared-pane rollup for ANY commutative
# registry monoid (hll/top3/toolset/... — the non-Catalyst-native aggs)
# ---------------------------------------------------------------------------

def _got_monoid(df, cols):
    return (
        df.selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            *cols,
        )
        .toPandas()
        .sort_values(["conv_id", "we", "ws"])
        .reset_index(drop=True)
    )


def test_pane_rollup_monoid_matches_native_plan(spark):
    """Cross-implementation oracle: the monoid path for (sum, max) with
    heterogeneous lifts must emit exactly the pure-Catalyst
    pane_rollup_multi's windows and values across both sizes."""
    from sliding_window_aggregators_spark.operators import (
        pane_rollup_monoid,
        pane_rollup_multi,
    )

    pdf = transcripts_pandas(1500, 24)
    df = spark.createDataFrame(pdf)
    kw = dict(
        value_exprs=("length(text)", "cast(turn_idx as double)"),
        sizes=("4 minutes", "8 minutes"),
        slide="1 minute",
    )
    got = _got_monoid(
        pane_rollup_monoid(df, monoids=("sum", "max"), **kw),
        ["wsum", "wmax"],
    )
    exp = _got_monoid(
        pane_rollup_multi(df, aggs=("sum", "max"), **kw),
        ["wsum", "wmax"],
    )
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wsum"].to_numpy() == pytest.approx(
        exp["wsum"].to_numpy(), rel=1e-12
    )
    assert got["wmax"].to_numpy() == pytest.approx(
        exp["wmax"].to_numpy(), rel=1e-12
    )


def test_pane_rollup_monoid_sketch_family_brute(spark):
    """The point of the operator — sketch/order-statistic monoids in the
    rollup shape: toolset (exact distinct, independent set-based brute),
    top3 (3rd largest w/ sentinel, independent sort-based brute), hll
    (deterministic register fold — pane fold order must not change the
    estimate vs a flat per-window fold)."""
    from sliding_window_aggregators_spark.functions.monoids import get_monoid
    from sliding_window_aggregators_spark.operators import pane_rollup_monoid

    pdf = transcripts_pandas(1200, 16)
    df = spark.createDataFrame(pdf)
    got = _got_monoid(
        pane_rollup_monoid(
            df,
            monoids=("toolset", "top3", "hll"),
            value_exprs=("turn_idx % 11", "turn_idx", "turn_idx % 97"),
            sizes=("4 minutes",),
            slide="1 minute",
            int_values=True,
        ),
        ["wtoolset", "wtop3", "whll"],
    )
    hll = get_monoid("hll", np.int64)
    sent = np.iinfo(np.int64).min
    rows = []
    for conv, g in pdf.groupby("conv_id"):
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ti = g["turn_idx"].to_numpy().astype(np.int64)
        panes = ts - ts % SLIDE
        ends = {int(p + k * SLIDE) for p in np.unique(panes)
                for k in range(1, SIZE // SLIDE + 1)}
        for e in sorted(ends):
            m = (ts >= e - SIZE) & (ts < e)
            if not m.any():
                continue
            tool = len(np.unique((ti[m] % 11) % 63))
            srt = np.sort(ti[m])
            t3 = int(srt[-3]) if len(srt) >= 3 else int(sent)
            est = float(hll.lower(hll.lift_reduce(ti[m] % 97))[0])
            rows.append((conv, e - SIZE, e, tool, t3, est))
    exp = pd.DataFrame(
        rows, columns=["conv_id", "ws", "we", "wtoolset", "wtop3", "whll"]
    )
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wtoolset"].tolist() == exp["wtoolset"].tolist()
    assert got["wtop3"].tolist() == exp["wtop3"].tolist()
    assert got["whll"].to_numpy() == pytest.approx(
        exp["whll"].to_numpy(), rel=1e-12
    )


def test_pane_rollup_monoid_vs_duckdb_toolset(spark, tmp_path):
    """Fully independent cross-engine oracle: DuckDB mirrors the toolset
    monoid operation-for-operation (bit_or of single-bit masks per pane,
    bit_or across panes, bit_count at the end)."""
    import duckdb

    from sliding_window_aggregators_spark.operators import pane_rollup_monoid

    pdf = transcripts_pandas(1500, 20)
    src = str(tmp_path / "rows.parquet")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    got = _got_monoid(
        pane_rollup_monoid(
            spark.read.parquet(src),
            monoids=("toolset",),
            value_expr="turn_idx % 11",
            sizes=("4 minutes",),
            slide="1 minute",
            int_values=True,
        ),
        ["wtoolset"],
    )
    exp = duckdb.connect().execute(f"""
        with rows as (
          select conv_id, ts, (turn_idx % 11) as v
          from read_parquet('{src}/*.parquet')
        ),
        panes as (
          select conv_id,
                 (epoch_us(ts) // {SLIDE}) * {SLIDE} as p,
                 bit_or(1::bigint << (v % 63)) as b
          from rows group by 1, 2
        ),
        contrib as (
          select conv_id, p + k.range * {SLIDE} as we, b
          from panes, range(1, {SIZE // SLIDE} + 1) k
        )
        select conv_id, we - {SIZE} as ws, we,
               bit_count(bit_or(b)) as wtoolset
        from contrib group by 1, 2, 3 order by 1, 3
    """).df()
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wtoolset"].tolist() == exp["wtoolset"].tolist()


def test_pane_rollup_monoid_plan_one_exchange(spark):
    """100 TB pins: the single exchange moves map-side pane PARTIALS
    (one MapInPandas BELOW the one hashpartitioning Exchange, the
    per-key fold above it), no Generate, no nested-loop join."""
    from sliding_window_aggregators_spark.operators import pane_rollup_monoid

    pdf = transcripts_pandas(300, 8)
    df = spark.createDataFrame(pdf)
    out = pane_rollup_monoid(
        df, monoids=("hll", "top3"), sizes=("4 minutes", "8 minutes"),
        slide="1 minute", value_expr="turn_idx", int_values=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "Generate" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    ex = plan.index("Exchange hashpartitioning")
    assert "MapInPandas" in plan[ex:], plan  # pre-combine below the shuffle


def test_pane_rollup_monoid_rejections(spark):
    from sliding_window_aggregators_spark.operators import pane_rollup_monoid

    pdf = transcripts_pandas(50, 4)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="commutative"):
        pane_rollup_monoid(df, monoids=("argmax",),
                           sizes=("4 minutes",), slide="1 minute")
    with pytest.raises(ValueError, match="multiple"):
        pane_rollup_monoid(df, sizes=("5 minutes",), slide="2 minutes")
    with pytest.raises(ValueError, match="duplicate"):
        pane_rollup_monoid(df, sizes=("4 minutes", "4 minutes"),
                           slide="1 minute")
    with pytest.raises(ValueError, match="value_exprs"):
        pane_rollup_monoid(df, monoids=("sum", "max"),
                           value_exprs=("length(text)",),
                           sizes=("4 minutes",), slide="1 minute")


def test_pane_rollup_monoid_matches_streaming_panes(spark, tmp_path):
    """Cross-PATH parity: the batch monoid rollup and the streaming
    shared-pane multi (pre-combined, 2-chunk replay + flush sentinel)
    must emit identical (window, value) sets for (toolset, top3) x
    (2m, 4m) — the docstring's emission-contract claim, pinned across
    two entirely different execution paths."""
    from sliding_window_aggregators_spark.operators import pane_rollup_monoid
    from sliding_window_aggregators_spark.streaming import (
        write_stream_exactly_once,
    )
    from sliding_window_aggregators_spark.streaming.engine import (
        sliding_panes_stream_multi,
    )

    src = tmp_path / "src"
    src.mkdir()
    pdf = transcripts_pandas(600, 12)

    def chunk(p, name):
        spark.createDataFrame(p).coalesce(1).write.mode("overwrite").parquet(
            str(src / name)
        )

    chunk(pdf.iloc[:300], "c0")
    chunk(pdf.iloc[300:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    chunk(flush, "c2f")

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    kw = dict(
        monoids=("toolset", "top3"),
        value_exprs=("turn_idx % 11", "turn_idx"),
        sizes=("2 minutes", "4 minutes"),
        slide="1 minute",
        int_values=True,
    )
    stream = sliding_panes_stream_multi(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*")),
        watermark="0 seconds",
        pre_combine=True,
        **kw,
    )
    q, sink = write_stream_exactly_once(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    got = _got_monoid(
        spark.read.parquet(str(tmp_path / "out")), ["wtoolset", "wtop3"]
    )
    got = got[got["conv_id"] != "__flush"].reset_index(drop=True)
    exp = _got_monoid(
        pane_rollup_monoid(spark.createDataFrame(pdf), **kw),
        ["wtoolset", "wtop3"],
    )
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wtoolset"].tolist() == exp["wtoolset"].tolist()
    assert got["wtop3"].tolist() == exp["wtop3"].tolist()
