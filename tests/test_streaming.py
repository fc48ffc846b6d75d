"""Structured Streaming integration: stateful sliding window via
applyInPandasWithState, stream-stream join, exactly-once sink with
checkpoint resume — each checked against a batch recompute."""

import glob
import importlib.util
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import brute_max_gap, brute_streak
from sliding_window_aggregators_spark.sources import transcripts_pandas
from sliding_window_aggregators_spark.streaming import (
    ExactlyOnceParquetSink,
    session_stream,
    sliding_agg_stream,
    sliding_count_stream,
    tumbling_stream,
    user_assistant_join,
    user_assistant_join_batch,
    write_stream_exactly_once,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(out), str(ckpt)


def _write_chunk(spark, src_dir: str, pdf: pd.DataFrame, name: str) -> None:
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, name)
    )


def _read_stream(spark, src_dir):
    return spark.readStream.schema(SCHEMA).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(os.path.join(src_dir, "*"))


def test_sliding_agg_stream_matches_batch(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")

    stream = sliding_agg_stream(
        _read_stream(spark, src),
        monoid_name="sum",
        value_expr="length(text)",
        duration="2 minutes",
        out_col="wsum",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wsum")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    # batch oracle: event-time window [ts-2min, ts] per conv
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy()
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - 120_000_000
            exp_rows.append((conv, g["ts"].iloc[i], float(lens[: i + 1][mask].sum())))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wsum"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum"].tolist() == exp["wsum"].tolist()


def test_sliding_count_stream_matches_batch(spark, stream_dirs):
    """COUNT-based window (no Spark primitive — the custom kernel's reason
    to exist): streaming output must equal the batch trailing-w recompute,
    including across the micro-batch boundary (kernel state carries)."""
    src, out, ckpt = stream_dirs
    W = 10
    pdf = transcripts_pandas(500, 15)
    _write_chunk(spark, src, pdf.iloc[:250], "c0")
    _write_chunk(spark, src, pdf.iloc[250:], "c1")

    stream = sliding_count_stream(
        _read_stream(spark, src), monoid_name="sum",
        value_expr="length(text)", w=W, out_col="wsum",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "turn_idx", "wsum")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        lens = g["text"].str.len().to_numpy()
        for i in range(len(g)):
            exp_rows.append(
                (conv, g["turn_idx"].iloc[i], float(lens[max(0, i - W + 1): i + 1].sum()))
            )
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "turn_idx", "wsum"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum"].tolist() == exp["wsum"].tolist()


def test_exactly_once_checkpoint_resume(spark, stream_dirs):
    """Re-running with the same checkpoint after new data arrives must not
    duplicate previously committed rows (idempotent batch commits)."""
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 10)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")

    def run():
        stream = sliding_agg_stream(
            _read_stream(spark, src),
            monoid_name="count",
            value_expr="1",
            duration="5 minutes",
            out_col="wcount",
        )
        q, sink = write_stream_exactly_once(stream, out, ckpt)
        q.awaitTermination(120)
        return sink

    sink = run()
    n1 = sink.read_committed(spark).count()
    assert n1 == 200
    # resume with more data
    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    sink = run()
    total = sink.read_committed(spark)
    assert total.count() == 400
    # no duplicate (conv_id, ts) pairs
    assert total.select("conv_id", "ts").distinct().count() == 400
    # lineage columns present
    assert {"_batch_id", "_partition_id"} <= set(total.columns)
    # simulate a REPLAYED batch: calling the sink again with a committed id
    # must be a no-op
    eos = ExactlyOnceParquetSink(out)
    replay_id = eos.committed_batches()[0]
    eos(spark.range(5).withColumnRenamed("id", "conv_id"), replay_id)
    assert total.count() == 400
    # per-partition metrics: every committed batch has a metrics JSON
    # whose per-file footer counts sum to its row count
    import json as _json

    for b in eos.committed_batches():
        with open(os.path.join(out, "_metrics", f"batch_{b}.json")) as fh:
            m = _json.load(fh)
        assert m["batch_id"] == b
        assert m["rows"] == sum(m["rows_per_file"].values())
        assert m["partitions"] == len(m["rows_per_file"])
    assert sum(
        _json.load(open(os.path.join(out, "_metrics", f"batch_{b}.json")))["rows"]
        for b in eos.committed_batches()
    ) == 400


def test_stream_stream_join_matches_batch_twin(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(500, 15)
    _write_chunk(spark, src, pdf, "c0")

    joined = user_assistant_join(_read_stream(spark, src), horizon="60 seconds")
    q, sink = write_stream_exactly_once(joined, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "user_turn", "reply_turn")
        .toPandas()
        .sort_values(["conv_id", "user_turn", "reply_turn"])
        .reset_index(drop=True)
    )
    exp = (
        user_assistant_join_batch(spark.createDataFrame(pdf), horizon="60 seconds")
        .select("conv_id", "user_turn", "reply_turn")
        .toPandas()
        .sort_values(["conv_id", "user_turn", "reply_turn"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == exp.values.tolist()
    assert len(got) > 0


def test_sliding_agg_stream_ooo_and_late_drop(spark, stream_dirs):
    """Out-of-order arrivals within the admit horizon are inserted in
    event-time order; rows older than youngest − duration are dropped
    (the reference's admit rule, cpp/src/benchmark_core.h:577)."""
    src, out, ckpt = stream_dirs
    DUR_US = 120_000_000
    pdf = transcripts_pandas(400, 8, ooo_distance=30, ooo_every=5)
    _write_chunk(spark, src, pdf, "c0")

    stream = sliding_agg_stream(
        _read_stream(spark, src), monoid_name="count", value_expr="1",
        duration="2 minutes", out_col="wcount",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wcount")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    # batch oracle: the engine bulk-inserts the whole micro-batch then
    # folds per row, so a row's window covers ALL batch rows with
    # ts ∈ [ts_i − duration, ts_i] — including duplicates/later arrivals at
    # the same instant (deterministic under replay). Single batch here →
    # whole-conv interval counts.
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        for i in range(len(g)):
            exp_rows.append(
                (conv, g["ts"].iloc[i], int(((ts >= ts[i] - DUR_US) & (ts <= ts[i])).sum()))
            )
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wcount"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert got["wcount"].tolist() == exp["wcount"].tolist()

    # a second batch arriving entirely older than youngest − duration is
    # dropped: emit no rows, leave state untouched
    stale = pdf.iloc[:20].copy()
    stale["ts"] = stale["ts"] - pd.Timedelta(hours=2)
    _write_chunk(spark, src, stale, "c1")
    q, sink = write_stream_exactly_once(
        sliding_agg_stream(
            _read_stream(spark, src), monoid_name="count", value_expr="1",
            duration="2 minutes", out_col="wcount",
        ),
        out, ckpt,
    )
    q.awaitTermination(120)
    total = sink.read_committed(spark).count()
    assert total == 400  # late rows produced no output


def test_tumbling_and_session_streams_run(spark, stream_dirs):
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(300, 10)
    _write_chunk(spark, src, pdf, "c0")
    t = tumbling_stream(_read_stream(spark, src), size="1 hour")
    q = (
        t.writeStream.outputMode("append")
        .format("memory")
        .queryName("tumb")
        .option("checkpointLocation", ckpt + "_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; with a final watermark all rows
    # may still be open — assert the query ran and the plan is stateful
    assert spark.sql("select * from tumb").columns == [
        "conv_id", "win_start", "win_end", "n_turns", "sum_val"
    ]

    s = session_stream(_read_stream(spark, src), gap="30 minutes")
    q2 = (
        s.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess")
        .option("checkpointLocation", ckpt + "_s")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql("select * from sess").columns == [
        "conv_id", "session_start", "session_end", "n_turns"
    ]


def _tws_protocol_available() -> bool:
    """transformWithState's Python state-server protocol needs
    google.protobuf; a real wheel or the vendored mini-runtime
    (compat.ensure_protobuf) both satisfy it."""
    from sliding_window_aggregators_spark.compat import protobuf_available

    return protobuf_available()


@pytest.mark.skipif(
    not _tws_protocol_available(),
    reason="no google.protobuf wheel and the vendored mini-runtime failed "
    "to import",
)
def test_sliding_count_stream_tws_matches_batch(spark, stream_dirs):
    """The transformWithStateInPandas (Spark 4 arbitrary-state API,
    RocksDB-backed) variant must produce exactly what the
    applyInPandasWithState path and the batch recompute produce, including
    kernel-state carry across the micro-batch boundary."""
    from sliding_window_aggregators_spark.streaming.engine import (
        sliding_count_stream_tws,
    )

    src, out, ckpt = stream_dirs
    W = 10
    pdf = transcripts_pandas(400, 12)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = sliding_count_stream_tws(
            _read_stream(spark, src), monoid_name="sum",
            value_expr="length(text)", w=W, out_col="wsum",
        )
        q, sink = write_stream_exactly_once(stream, out, ckpt)
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "turn_idx", "wsum")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        lens = g["text"].str.len().to_numpy()
        for i in range(len(g)):
            exp_rows.append(
                (conv, g["turn_idx"].iloc[i], float(lens[max(0, i - W + 1): i + 1].sum()))
            )
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "turn_idx", "wsum"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum"].tolist() == exp["wsum"].tolist()


def test_rising_pattern_stream_matches_batch(spark, stream_dirs):
    """Streaming CEP (three rising ticks) fires exactly where the batch
    lag-window twin fires, including patterns spanning the micro-batch
    boundary (state carries the last runs−1 values)."""
    from sliding_window_aggregators_spark.streaming.engine import (
        rising_pattern_stream,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(500, 15)
    _write_chunk(spark, src, pdf.iloc[:250], "c0")
    _write_chunk(spark, src, pdf.iloc[250:], "c1")

    stream = rising_pattern_stream(
        _read_stream(spark, src), value_expr="length(text)", runs=3
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "turn_idx")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        lens = g["text"].str.len().to_numpy()
        for i in range(2, len(g)):
            if lens[i - 2] < lens[i - 1] < lens[i]:
                exp_rows.append((conv, int(g["turn_idx"].iloc[i])))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "turn_idx"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(exp) > 0
    assert got.values.tolist() == exp.values.tolist()


def test_dedup_stream_drops_cross_batch_replays(spark, stream_dirs):
    """Streaming exact dedup: replayed rows (same conv_id, turn_idx) in a
    later chunk must not reappear in the sink."""
    from sliding_window_aggregators_spark.streaming import dedup_stream

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(300, 10)
    # chunk 1 = first 200 rows; chunk 2 = last 100 PLUS a replay of 50
    replay = pdf.iloc[100:150]
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pd.concat([pdf.iloc[200:], replay]), "c1")

    stream = dedup_stream(
        _read_stream(spark, src), keys=("conv_id", "turn_idx"), watermark="1 minute"
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "turn_idx")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == 300  # replays removed
    assert not got.duplicated().any()


def test_hll_distinct_stream_matches_batch_spec(spark, stream_dirs):
    """Streaming HLL: after all chunks, each key's latest estimate equals
    the batch-spec (first-principles Python) HLL over the key's values —
    the register merge is order/replay-insensitive."""
    from conftest import hll_reference as hll_py
    from sliding_window_aggregators_spark.streaming import hll_distinct_stream

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 10)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")

    stream = hll_distinct_stream(
        _read_stream(spark, src), key="conv_id", value_expr="text"
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    committed = sink.read_committed(spark).toPandas()
    # latest estimate per key = the row from the highest batch id
    latest = (
        committed.sort_values("_batch_id")
        .groupby("conv_id")
        .tail(1)
        .set_index("conv_id")["hll_est"]
    )
    for conv, g in pdf.groupby("conv_id"):
        assert latest[conv] == hll_py(g["text"].tolist())


def test_sliding_agg_stream_histq_vector_partials(spark, stream_dirs):
    """The histogram-quantile monoid (64-lane vector partials) through the
    event-time stream engine: OrderedAggState serde + interval folds must
    handle array-shaped partials; checked against a brute per-turn
    recompute of the same spec."""
    from sliding_window_aggregators_spark.functions.monoids import (
        HISTQ_B,
        HISTQ_PCT,
        HISTQ_SHIFT,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 20)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")

    stream = sliding_agg_stream(
        _read_stream(spark, src),
        monoid_name="histq",
        value_expr="length(text)",
        duration="2 minutes",
        out_col="wp99",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wp99")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )

    def brute_p99(vals):
        import numpy as np

        b = np.minimum(np.maximum(np.asarray(vals, dtype=np.int64), 0) >> HISTQ_SHIFT, HISTQ_B - 1)
        counts = np.bincount(b, minlength=HISTQ_B)
        k = (HISTQ_PCT * counts.sum() + 99) // 100
        return int(np.argmax(np.cumsum(counts) >= k) << HISTQ_SHIFT)

    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        lens = g["text"].str.len().to_numpy()
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - 120_000_000
            exp_rows.append((conv, g["ts"].iloc[i], brute_p99(lens[: i + 1][mask])))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wp99"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wp99"].tolist() == exp["wp99"].tolist()


def test_user_next_reply_matches_brute(spark, stream_dirs):
    """§F7 semantics: each user turn → its FIRST reply within the horizon;
    streaming (join → min-by, two chained stateful ops) vs batch twin vs
    a brute pandas recompute."""
    from sliding_window_aggregators_spark.streaming import (
        user_next_reply,
        user_next_reply_batch,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 12)
    _write_chunk(spark, src, pdf, "c0")

    batch = (
        user_next_reply_batch(spark.createDataFrame(pdf), horizon="60 seconds")
        .toPandas()
        .sort_values(["conv_id", "user_turn"])
        .reset_index(drop=True)
    )
    # brute: per user turn, earliest reply within 60s (ties → lower turn)
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"])
        reps = g[g["role"].isin(["assistant", "tool"])]
        for _, u in g[g["role"] == "user"].iterrows():
            cand = reps[
                (reps["ts"] >= u["ts"])
                & (reps["ts"] <= u["ts"] + pd.Timedelta(seconds=60))
            ].sort_values(["ts", "turn_idx"])
            if len(cand):
                exp_rows.append((conv, int(u["turn_idx"]), int(cand.iloc[0]["turn_idx"])))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "user_turn", "reply_turn"])
        .sort_values(["conv_id", "user_turn"])
        .reset_index(drop=True)
    )
    assert len(batch) == len(exp) and len(exp) > 0
    assert batch[["conv_id", "user_turn", "reply_turn"]].values.tolist() == exp.values.tolist()

    stream = user_next_reply(_read_stream(spark, src), horizon="60 seconds")
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .select("conv_id", "user_turn", "reply_turn")
        .toPandas()
        .sort_values(["conv_id", "user_turn"])
        .reset_index(drop=True)
    )
    # append-mode semantics: groups whose event time is still inside the
    # watermark horizon at end-of-input are correctly WITHHELD (they would
    # finalize when later data advances the watermark); compare on the
    # closed region and require no spurious rows anywhere
    got_set = {tuple(r) for r in got.values.tolist()}
    exp_set = {tuple(r) for r in exp.values.tolist()}
    assert got_set <= exp_set  # nothing wrong was emitted
    u_ts = pdf[pdf["role"] == "user"].set_index(["conv_id", "turn_idx"])["ts"]
    closed_cut = pdf["ts"].max() - pd.Timedelta(seconds=200)  # 2min wm + slack
    closed = {
        t for t in exp_set if u_ts.loc[(t[0], t[1])] <= closed_cut
    }
    assert closed and closed <= got_set  # everything finalized was emitted


def test_admitted_late_row_folds_over_full_window(spark, stream_dirs):
    """A late row the admission rule accepts must aggregate over its FULL
    [t − duration, t] window — state retention is 2×duration, so rows the
    previous batch already saw are still foldable (eviction at exactly one
    duration undercounted admitted late rows)."""
    src, out, ckpt = stream_dirs
    base = pd.Timestamp("2024-01-01")

    def mk(turns):
        return pd.DataFrame(
            {
                "conv_id": ["c"] * len(turns),
                "turn_idx": np.arange(len(turns), dtype=np.int32),
                "role": ["user"] * len(turns),
                "text": ["x" * v for _, v in turns],
                "tool": ["t"] * len(turns),
                "ts": [base + pd.Timedelta(seconds=s) for s, _ in turns],
            }
        )

    # batch 1: rows at 0s..100s; batch 2: a LATE row at 70s (youngest=100,
    # duration=60s → admission horizon 40s; its window [10s, 70s] includes
    # the 20s and 60s rows, which one-duration eviction would have dropped)
    b1 = mk([(0, 1), (20, 2), (60, 4), (100, 8)])
    b2 = mk([(70, 16)])
    b2["turn_idx"] = np.array([4], dtype=np.int32)
    _write_chunk(spark, src, b1, "c0")

    stream = sliding_agg_stream(
        _read_stream(spark, src), monoid_name="sum",
        value_expr="length(text)", duration="1 minute", out_col="wsum",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(90)
    _write_chunk(spark, src, b2, "c1")
    q, sink = write_stream_exactly_once(
        sliding_agg_stream(
            _read_stream(spark, src), monoid_name="sum",
            value_expr="length(text)", duration="1 minute", out_col="wsum",
        ),
        out, ckpt,
    )
    q.awaitTermination(90)
    got = sink.read_committed(spark).toPandas()
    late = got[got["ts"] == base + pd.Timedelta(seconds=70)]
    assert len(late) == 1
    # [10s, 70s] window: 20s(2) + 60s(4) + 70s(16) = 22
    assert float(late["wsum"].iloc[0]) == 22.0


def test_tumbling_stream_salted_matches_unsalted(spark, stream_dirs):
    """The salted two-phase tumbling aggregate must equal the plain one —
    the salt only spreads state keys, never changes results."""
    from sliding_window_aggregators_spark.streaming import tumbling_stream_salted

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(500, 5)  # few keys → genuinely hot
    _write_chunk(spark, src, pdf, "c0")

    plain = tumbling_stream(
        spark.createDataFrame(pdf), size="1 minute", watermark="1 minute"
    ).toPandas()
    q, sink = write_stream_exactly_once(
        tumbling_stream_salted(
            _read_stream(spark, src), size="1 minute",
            watermark="1 minute", buckets=4,
        ),
        out, ckpt,
    )
    q.awaitTermination(120)
    got = sink.read_committed(spark).select(plain.columns.tolist()).toPandas()
    key = ["conv_id", "win_start"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    # append-mode withholds windows still inside the watermark at EOF;
    # everything emitted must match the batch aggregate exactly
    merged = b.merge(a, on=key, suffixes=("_s", "_p"))
    assert len(merged) == len(b) and len(b) > 0
    assert (merged["n_turns_s"] == merged["n_turns_p"]).all()
    assert (merged["sum_val_s"] == merged["sum_val_p"]).all()


def test_sliding_agg_stream_multi_matches_batch(spark, stream_dirs):
    """Window-shared multi-aggregate stream (2 monoids x 2 durations in ONE
    stateful operator): every output column must equal the per-conv batch
    recompute of its (monoid, duration) pair, including across the
    micro-batch boundary (ordered state carries per monoid)."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")

    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("sum", "max"),
        durations=("1 minutes", "3 minutes"),
        value_expr="length(text)",
        int_values=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wsum_0", "wsum_1", "wmax_0", "wmax_1")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy()
        for i in range(len(g)):
            row = [conv, g["ts"].iloc[i]]
            for dur in (60_000_000, 180_000_000):
                mask = ts[: i + 1] >= ts[i] - dur
                row.append(int(lens[: i + 1][mask].sum()))
            for dur in (60_000_000, 180_000_000):
                mask = ts[: i + 1] >= ts[i] - dur
                row.append(int(lens[: i + 1][mask].max()))
            exp_rows.append(tuple(row))
    exp = (
        pd.DataFrame(
            exp_rows,
            columns=["conv_id", "ts", "wsum_0", "wsum_1", "wmax_0", "wmax_1"],
        )
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("wsum_0", "wsum_1", "wmax_0", "wmax_1"):
        assert got[c].astype(int).tolist() == exp[c].tolist(), c


def test_state_partition_floor_applied_before_stream_start(spark, stream_dirs):
    """The round-4 scaling study showed shuffle.partitions below the floor
    (8 state partitions) makes one task wave per micro-batch with the
    Zipf-hot partition setting the wall; the engine must raise the session
    to STATE_PARTITION_FLOOR at stream construction (the state partition
    count is frozen into the checkpoint at first query start), and the
    opt-out must leave the caller's setting untouched."""
    from sliding_window_aggregators_spark.streaming.engine import (
        STATE_PARTITION_FLOOR,
        sliding_agg_stream,
    )

    src, _, _ = stream_dirs
    pdf = transcripts_pandas(40, 4)
    _write_chunk(spark, src, pdf, "c0")
    conf = spark.conf
    orig = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.shuffle.partitions", "8")
        with pytest.warns(UserWarning, match="state-partition packing floor"):
            sliding_agg_stream(_read_stream(spark, src))
        assert int(conf.get("spark.sql.shuffle.partitions")) == (
            STATE_PARTITION_FLOOR
        )

        conf.set("spark.sql.shuffle.partitions", "8")
        sliding_agg_stream(_read_stream(spark, src), min_state_partitions=None)
        assert int(conf.get("spark.sql.shuffle.partitions")) == 8

        # a deliberate setting ABOVE the floor is never lowered
        conf.set("spark.sql.shuffle.partitions", "200")
        sliding_agg_stream(_read_stream(spark, src))
        assert int(conf.get("spark.sql.shuffle.partitions")) == 200
    finally:
        conf.set("spark.sql.shuffle.partitions", orig)


def test_sliding_agg_stream_multi_heterogeneous_exprs(spark, stream_dirs):
    """Per-monoid lifted inputs in the ONE fused stateful operator — the
    reference's twin/shared modes give each aggregator its own lifted
    input (cpp/src/benchmark_core.h:472-562): sum(length(text)) +
    max(turn_idx) + sum(turn_idx) fused, with the duplicate expression
    deduplicated to one shuffled column and duplicate monoid names
    disambiguated as w{mi}_{name}_{i}. The plan must still carry exactly
    one Exchange and only the two distinct __v columns."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")

    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("sum", "max", "sum"),
        durations=("3 minutes",),
        value_exprs=("length(text)", "turn_idx", "turn_idx"),
        int_values=True,
    )
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "__v0" in plan and "__v1" in plan and "__v2" not in plan

    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    phys = q._jsq.explainInternal(False)
    # the fused operator pays ONE shuffle for all 3 aggregates, and the
    # state-partition floor is live in the executed micro-batch plan
    assert phys.count("Exchange") == 1, phys
    assert "numPartitions = 32" in phys, phys

    cols = ["w0_sum_0", "w1_max_0", "w2_sum_0"]
    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", *cols)
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    exp_rows = []
    dur = 180_000_000
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy()
        tix = g["turn_idx"].to_numpy()
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - dur
            exp_rows.append(
                (
                    conv,
                    g["ts"].iloc[i],
                    int(lens[: i + 1][mask].sum()),
                    int(tix[: i + 1][mask].max()),
                    int(tix[: i + 1][mask].sum()),
                )
            )
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts"] + cols)
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in cols:
        assert got[c].astype(int).tolist() == exp[c].tolist(), c


def test_sliding_agg_stream_multi_minhash_adjsum(spark, stream_dirs):
    """The round-5 monoids through the streaming shell: a per-conversation
    ROLLING MinHash fingerprint (wminhash_0 — the streaming twin of the
    batch MinHash-LSH dedup path) and the lag-1 adjacent-product sum
    (wadjsum_0 — non-commutative, so the ordered state's fold ORDER is
    load-bearing), fused in one stateful operator across a micro-batch
    boundary. Expected values are an INDEPENDENT numpy recompute (the
    raw mixer for minhash, the literal Σ v_{i-1}·v_i for adjsum), not
    the monoid code."""
    from sliding_window_aggregators_spark.functions.monoids import (
        _MINHASH_SALTS,
        _bloom_mix,
    )
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")

    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("minhash", "adjsum"),
        durations=("3 minutes",),
        value_exprs=("length(text)", "length(text)"),
        int_values=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wminhash_0", "wadjsum_0")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    dur = 180_000_000
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["text"].str.len().to_numpy().astype(np.int64)
        h0 = _bloom_mix(
            _bloom_mix(np.full(len(v), 101, dtype=np.uint64), v.astype(np.uint64)),
            _MINHASH_SALTS[0],
        )
        for i in range(len(g)):
            lo = int(np.searchsorted(ts[: i + 1], ts[i] - dur, side="left"))
            seg = v[lo : i + 1]
            mh = int(h0[lo : i + 1].min().astype(np.uint64).view(np.int64))
            aj = int((seg[:-1] * seg[1:]).sum()) if len(seg) > 1 else 0
            exp_rows.append((conv, g["ts"].iloc[i], mh, aj))
    exp = (
        pd.DataFrame(
            exp_rows, columns=["conv_id", "ts", "wminhash_0", "wadjsum_0"]
        )
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wminhash_0"].astype(int).tolist() == exp["wminhash_0"].tolist()
    assert got["wadjsum_0"].astype(int).tolist() == exp["wadjsum_0"].tolist()


def test_sliding_agg_stream_multi_trend_toolset(spark, stream_dirs):
    """The round-5 regression + exact-distinct monoids through the
    streaming shell: the rolling OLS slope numerator over text length
    (wtrend_0 — invertible AND non-commutative, so the ordered state's
    positional fold is load-bearing) and the exact distinct-tools count
    (wtoolset_0 — the input_hint's ``tool`` column as a bitset), fused
    in one stateful operator across a micro-batch boundary. Expected
    values are an INDEPENDENT pandas recompute (the literal
    n·Σi·v − (Σi)(Σv) / len(set(...)), not the monoid code)."""
    from sliding_window_aggregators_spark.sources.transcripts import TOOLS
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")

    tools_sql = ", ".join(f"'{t}'" for t in TOOLS)
    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("trend", "toolset"),
        durations=("3 minutes",),
        value_exprs=(
            "length(text)",
            f"coalesce(array_position(array({tools_sql}), tool), 0)",
        ),
        int_values=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wtrend_0", "wtoolset_0")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    dur = 180_000_000
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["text"].str.len().to_numpy().astype(np.int64)
        tid = np.array(
            [TOOLS.index(t) + 1 if t is not None else 0 for t in g["tool"]],
            dtype=np.int64,
        )
        for i in range(len(g)):
            lo = int(np.searchsorted(ts[: i + 1], ts[i] - dur, side="left"))
            seg = v[lo : i + 1]
            n = len(seg)
            pos = np.arange(n, dtype=np.int64)
            tr = int(n * (pos * seg).sum() - pos.sum() * seg.sum())
            td = len(set(tid[lo : i + 1].tolist()))
            exp_rows.append((conv, g["ts"].iloc[i], tr, td))
    exp = (
        pd.DataFrame(
            exp_rows, columns=["conv_id", "ts", "wtrend_0", "wtoolset_0"]
        )
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wtrend_0"].astype(int).tolist() == exp["wtrend_0"].tolist()
    assert got["wtoolset_0"].astype(int).tolist() == exp["wtoolset_0"].tolist()


def test_sliding_agg_stream_multi_maxrun_maxgap(spark, stream_dirs):
    """The round-5 segment monoids through the streaming shell: the
    longest consecutive tool-call streak (wmaxrun_0 — prefix/suffix/best
    concatenation, non-commutative) and the max adjacent turn gap in µs
    (wmaxgap_0 — stall detection; gap diffs cancel any FIXED session-tz
    offset — the repo session pins UTC — so the cast-based µs lift is
    exact here), fused in one stateful operator
    across a micro-batch boundary. Expected values are an INDEPENDENT
    pandas recompute (literal run-length loop / literal adjacent diffs),
    not the monoid code."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")

    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("maxrun", "maxgap"),
        durations=("3 minutes",),
        value_exprs=(
            "cast(role = 'tool' as bigint)",
            "unix_micros(cast(ts as timestamp))",
        ),
        int_values=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wmaxrun_0", "wmaxgap_0")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    dur = 180_000_000
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        bits = (g["role"].to_numpy() == "tool").astype(np.int64)
        for i in range(len(g)):
            lo = int(np.searchsorted(ts[: i + 1], ts[i] - dur, side="left"))
            best = brute_streak(bits[lo : i + 1])
            gap = brute_max_gap(ts[lo : i + 1])
            exp_rows.append((conv, g["ts"].iloc[i], best, gap))
    exp = (
        pd.DataFrame(
            exp_rows, columns=["conv_id", "ts", "wmaxrun_0", "wmaxgap_0"]
        )
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wmaxrun_0"].astype(int).tolist() == exp["wmaxrun_0"].tolist()
    assert got["wmaxgap_0"].astype(int).tolist() == exp["wmaxgap_0"].tolist()


def test_sliding_agg_stream_multi_heterogeneous_times_durations(
    spark, stream_dirs
):
    """Heterogeneous lifts × MULTIPLE durations in one stateful operator —
    the full window-sharing × aggregate-fusion matrix cell (previous
    tests covered each axis separately): sum(length) + maxrun(tool-bit)
    each over BOTH a 2-minute and a 6-minute window, one shuffle, four
    output columns, vs an independent pandas recompute."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(500, 15)
    _write_chunk(spark, src, pdf.iloc[:250], "c0")
    _write_chunk(spark, src, pdf.iloc[250:], "c1")

    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("sum", "maxrun"),
        durations=("2 minutes", "6 minutes"),
        value_exprs=("length(text)", "cast(role = 'tool' as bigint)"),
        int_values=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    cols = ["wsum_0", "wsum_1", "wmaxrun_0", "wmaxrun_1"]
    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", *cols)
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    durs = [120_000_000, 360_000_000]
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["text"].str.len().to_numpy().astype(np.int64)
        bits = (g["role"].to_numpy() == "tool").astype(np.int64)
        for i in range(len(g)):
            row = [conv, g["ts"].iloc[i]]
            for d in durs:
                lo = int(np.searchsorted(ts[: i + 1], ts[i] - d, side="left"))
                row.append(int(v[lo: i + 1].sum()))
            for d in durs:
                lo = int(np.searchsorted(ts[: i + 1], ts[i] - d, side="left"))
                row.append(brute_streak(bits[lo: i + 1]))
            exp_rows.append(tuple(row))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts"] + cols)
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in cols:
        assert got[c].astype(int).tolist() == exp[c].tolist(), c


def test_replan_emit_filter_zero_duplicates(spark, stream_dirs):
    """Zero-duplicate RE-PLAN: a chunk-halo re-plan changes the state
    grouping key, so the old checkpoint is unusable by design — the
    recipe is a FRESH checkpoint over the full source with
    ``emit_filter`` suppressing rows the old run already emitted
    (replayed rows warm state only). Phase 1 drains c0+c1 through the
    plain plan; phase 2 re-plans with hot_keys + chunk_span over
    c0+c1+c2 and ``emit_filter = input_file_name() like '%/c2/%'``.
    Old-sink ∪ new-sink must equal the uninterrupted batch recompute
    over all three chunks EXACTLY — no duplicates (suppression works),
    no gaps, and windows spanning the c1/c2 boundary correct (the
    replay rebuilt cross-cutover state)."""
    import os

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(900, 12)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:600], "c1")

    kwargs = dict(
        monoid_name="sum", value_expr="length(text)",
        duration="3 minutes", out_col="wsum", int_values=True,
    )
    stream1 = sliding_agg_stream(_read_stream(spark, src), **kwargs)
    q1, sink1 = write_stream_exactly_once(stream1, out, ckpt)
    q1.awaitTermination(120)

    # new data arrives; re-plan the hottest conversation with chunk-halo
    _write_chunk(spark, src, pdf.iloc[600:], "c2")
    hot = pdf["conv_id"].value_counts().idxmax()
    out2, ckpt2 = out + "_replan", ckpt + "_replan"
    stream2 = sliding_agg_stream(
        _read_stream(spark, src),
        hot_keys=[hot],
        chunk_span="5 minutes",
        emit_filter="input_file_name() like '%/c2/%'",
        **kwargs,
    )
    q2, sink2 = write_stream_exactly_once(stream2, out2, ckpt2)
    q2.awaitTermination(120)

    got = (
        pd.concat(
            [
                sink1.read_committed(spark)
                .select("conv_id", "ts", "wsum")
                .toPandas(),
                sink2.read_committed(spark)
                .select("conv_id", "ts", "wsum")
                .toPandas(),
            ]
        )
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert not got.duplicated(["conv_id", "ts"]).any()

    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy().astype(np.int64)
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - 180_000_000
            exp_rows.append((conv, g["ts"].iloc[i], int(lens[: i + 1][mask].sum())))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wsum"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum"].astype(int).tolist() == exp["wsum"].tolist()


def test_replan_emit_filter_multi_unchunked(spark, stream_dirs):
    """emit_filter on the fused multi-aggregate stream WITHOUT chunk-halo
    (the suppression column stands alone): phase 1 drains c0, phase 2
    re-reads c0+c1 under a fresh checkpoint emitting only c1 rows; the
    union equals the batch recompute — the cross-phase windows prove the
    muted replay warmed the shared ordered state."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 10)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")

    def mk(emit_filter=None):
        return sliding_agg_stream_multi(
            _read_stream(spark, src),
            monoids=("sum", "max"),
            durations=("3 minutes",),
            value_exprs=("length(text)", "turn_idx"),
            int_values=True,
            emit_filter=emit_filter,
        )

    q1, sink1 = write_stream_exactly_once(mk(), out, ckpt)
    q1.awaitTermination(120)

    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    q2, sink2 = write_stream_exactly_once(
        mk(emit_filter="input_file_name() like '%/c1/%'"),
        out + "_replan", ckpt + "_replan",
    )
    q2.awaitTermination(120)

    cols = ["conv_id", "ts", "wsum_0", "wmax_0"]
    got = (
        pd.concat(
            [
                sink1.read_committed(spark).select(*cols).toPandas(),
                sink2.read_committed(spark).select(*cols).toPandas(),
            ]
        )
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert not got.duplicated(["conv_id", "ts"]).any()

    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy().astype(np.int64)
        tix = g["turn_idx"].to_numpy().astype(np.int64)
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - 180_000_000
            exp_rows.append(
                (conv, g["ts"].iloc[i],
                 int(lens[: i + 1][mask].sum()),
                 int(tix[: i + 1][mask].max()))
            )
    exp = (
        pd.DataFrame(exp_rows, columns=cols)
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum_0"].astype(int).tolist() == exp["wsum_0"].tolist()
    assert got["wmax_0"].astype(int).tolist() == exp["wmax_0"].tolist()


def test_session_stream_ooo_merge_across_microbatches(spark, stream_dirs):
    """SURVEY M4's named hard part: a late (in-watermark) row arriving in a
    LATER micro-batch must merge previously-separate sessions. Chunk c0
    carries turns at minutes 0 and 8 (gap 5m -> two open sessions); chunk
    c1 delivers minute 4 late, bridging them into ONE session; a flush
    chunk advances the watermark so append mode finalizes everything. A
    second conv with a 20-minute gap pins that non-bridged sessions stay
    split. Output must equal the batch session_window recompute."""
    src, _, ckpt = stream_dirs
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(conv, minutes):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": range(len(minutes)),
                "role": "user",
                "text": "x",
                "tool": "",
                "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
            }
        )

    c0 = pd.concat([rows("c1", [0, 8]), rows("c2", [0, 20])])
    c1 = rows("c1", [4])  # late but inside the 10m watermark
    flush = rows("__flush", [600])
    _write_chunk(spark, src, c0, "c0")
    _write_chunk(spark, src, c1, "c1")
    _write_chunk(spark, src, flush, "c2f")

    stream = session_stream(
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*")),
        gap="5 minutes",
        watermark="10 minutes",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_ooo")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.sql(
            "select * from sess_ooo where conv_id != '__flush' "
            "order by conv_id, session_start"
        )
        .toPandas()
    )
    batch = spark.createDataFrame(pd.concat([c0, c1]))
    exp = (
        session_stream(batch, gap="5 minutes", watermark="10 minutes")
        .orderBy("conv_id", "session_start")
        .toPandas()
    )
    assert got.values.tolist() == exp.values.tolist(), (got, exp)
    # the bridge actually happened: c1 is ONE 3-turn session
    c1_rows = got[got["conv_id"] == "c1"]
    assert len(c1_rows) == 1 and int(c1_rows["n_turns"].iloc[0]) == 3
    # and the non-bridged conv stayed split
    assert (got["conv_id"] == "c2").sum() == 2


def test_session_stream_scrambled_replay_matches_batch(spark, stream_dirs):
    """Session windows under fully scrambled arrival: rows are dealt into
    4 chunks by row-hash (any row may arrive 'late' relative to its
    neighbors), replayed one file per micro-batch under a generous
    watermark, flushed, and the merged-session output must equal the
    batch session_window recompute of the whole table."""
    src, _, ckpt = stream_dirs
    rng = np.random.default_rng(7)
    n_convs, n_turns = 8, 30
    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00").value // 1000
    for c in range(n_convs):
        gaps_s = rng.choice([30, 200], size=n_turns, p=[0.8, 0.2])
        ts = base + np.cumsum(gaps_s) * 1_000_000 + c * 1_000_000
        for i, t in enumerate(ts):
            rows.append((f"conv{c:02d}", i, "user", "x", "", t))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
    chunk_of = (
        pd.util.hash_pandas_object(
            pdf["conv_id"] + pdf["turn_idx"].astype(str), index=False
        )
        % 4
    ).to_numpy()
    for b in range(4):
        _write_chunk(spark, src, pdf[chunk_of == b], f"s{b}")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=40)
    _write_chunk(spark, src, flush, "s4f")

    stream = session_stream(
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*")),
        gap="2 minutes",
        watermark="30 days",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_scram")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql(
            "select * from sess_scram where conv_id != '__flush' "
            "order by conv_id, session_start"
        )
        .toPandas()
    )
    exp = (
        session_stream(
            spark.createDataFrame(pdf), gap="2 minutes", watermark="30 days"
        )
        .orderBy("conv_id", "session_start")
        .toPandas()
    )
    # multiple sessions per conv actually formed (the 200s gaps split)
    assert len(exp) > n_convs
    assert got.values.tolist() == exp.values.tolist()


@pytest.mark.skipif(
    not _tws_protocol_available(),
    reason="no google.protobuf wheel and the vendored mini-runtime failed "
    "to import",
)
@pytest.mark.parametrize(
    "monoid_name,value_expr",
    [
        ("sum", "length(text)"),
        # maxgap is order-SENSITIVE (segment concatenation): under OOO
        # arrival the ordered state must fold in event-time order for
        # the gaps to be true — the sharpest parity case for the two APIs
        ("maxgap", "unix_micros(cast(ts as timestamp))"),
    ],
)
def test_sliding_agg_stream_tws_matches_apply_path(
    spark, stream_dirs, monoid_name, value_expr
):
    """The OOO ordered-aggregate state under the PRODUCTION arbitrary-
    state API (transformWithStateInPandas + RocksDB) must produce exactly
    what the applyInPandasWithState path produces — same per-turn answers
    over out-of-order arrivals spanning two micro-batches (both APIs call
    the shared _ooo_sliding_step kernel, the engine's FiBA analogue under
    the reference's production-API contract, FiBA.hpp:1837-1918)."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_tws,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 8, ooo_distance=30, ooo_every=5)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")

    def run(factory, out_dir, ckpt_dir, **extra):
        stream = factory(
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*")),
            monoid_name=monoid_name,
            value_expr=value_expr,
            duration="2 minutes",
            out_col="wsum",
            int_values=True,
            **extra,
        )
        q, sink = write_stream_exactly_once(stream, out_dir, ckpt_dir)
        q.awaitTermination(180)
        return (
            sink.read_committed(spark)
            .select("conv_id", "ts", "wsum")
            .toPandas()
            .sort_values(["conv_id", "ts", "wsum"])
            .reset_index(drop=True)
        )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got_tws = run(sliding_agg_stream_tws, out + "_tws", ckpt + "_tws")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got_apply = run(sliding_agg_stream, out + "_a", ckpt + "_a")

    assert len(got_tws) == len(got_apply) == 400
    assert got_tws["wsum"].tolist() == got_apply["wsum"].tolist()
    assert got_tws["conv_id"].tolist() == got_apply["conv_id"].tolist()


@pytest.mark.skipif(
    not _tws_protocol_available(),
    reason="no google.protobuf wheel and the vendored mini-runtime failed "
    "to import",
)
def test_conversation_timeout_stream_matches_session_recompute(
    spark, stream_dirs
):
    """Event-time-timer CEP: one closure row per quiet-gap, fired when the
    watermark passes last-activity + gap. With in-order-per-conv arrival
    the closures must equal the batch session_window recompute (start,
    end = last + gap, count), including a session SPANNING the micro-batch
    boundary (the deadline must be extended, not double-fired). Exercises
    the state server's full timer protocol (Register/Delete/ListTimers +
    expiry callbacks) through the vendored protobuf runtime."""
    from sliding_window_aggregators_spark.streaming import (
        conversation_timeout_stream,
    )

    src, _, ckpt = stream_dirs
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(conv, minutes):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": range(len(minutes)),
                "role": "user",
                "text": "x",
                "tool": "",
                "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
            }
        )

    # c1: turns 0,2 | batch boundary | 4,6  → ONE session (gaps 2m < 5m)
    #     then 30,31 → a second session
    # c2: 0,1 then quiet → one session; c3 single turn → one session
    c0 = pd.concat([rows("c1", [0, 2]), rows("c2", [0, 1]), rows("c3", [0])])
    c1 = rows("c1", [4, 6, 30, 31])
    flush = rows("__flush", [600])
    _write_chunk(spark, src, c0, "c0")
    _write_chunk(spark, src, c1, "c1")
    _write_chunk(spark, src, flush, "c2f")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = conversation_timeout_stream(
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*")),
            gap="5 minutes",
            watermark="2 minutes",
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("conv_timeout")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    got = (
        spark.sql(
            "select * from conv_timeout where conv_id != '__flush' "
            "order by conv_id, session_start"
        )
        .toPandas()
    )
    exp = (
        session_stream(
            spark.createDataFrame(pd.concat([c0, c1])),
            gap="5 minutes",
            watermark="2 minutes",
        )
        .orderBy("conv_id", "session_start")
        .toPandas()
    )
    # same sessions: (conv, start, end==timeout_at, count)
    assert got[["conv_id", "session_start", "timeout_at"]].values.tolist() == (
        exp[["conv_id", "session_start", "session_end"]].values.tolist()
    )
    assert got["n_turns"].tolist() == exp["n_turns"].tolist()
    # the boundary-spanning session really is one 4-turn closure
    c1_first = got[got["conv_id"] == "c1"].iloc[0]
    assert int(c1_first["n_turns"]) == 4


def test_chunk_span_shorter_than_duration_rejected(spark, stream_dirs):
    src, _out, _ckpt = stream_dirs
    pdf = transcripts_pandas(50, 4)
    _write_chunk(spark, src, pdf, "c0")
    with pytest.raises(ValueError, match="chunk_span"):
        sliding_agg_stream(
            _read_stream(spark, src),
            duration="10 minutes",
            chunk_span="2 minutes",
            hot_keys=["conv000000"],
        )


def test_sliding_agg_stream_chunk_halo_matches_unchunked(spark, stream_dirs):
    """Hot-key event-time chunk-halo decomposition: identical per-turn
    answers to the whole-key plan while the hot key's state spreads over
    one group per elapsed chunk span (more state groups, same output)."""
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(800, 6)  # ts spans ~13 min; few convs -> hot
    hot = pdf["conv_id"].value_counts().index[0]
    _write_chunk(spark, src, pdf.iloc[:400], "c0")
    _write_chunk(spark, src, pdf.iloc[400:], "c1")

    def run(tag, **extra):
        stream = sliding_agg_stream(
            _read_stream(spark, src),
            monoid_name="sum",
            value_expr="length(text)",
            duration="2 minutes",
            out_col="wsum",
            id_cols=("turn_idx",),
            **extra,
        )
        q, sink = write_stream_exactly_once(
            stream, f"{out}_{tag}", f"{ckpt}_{tag}"
        )
        q.awaitTermination(180)
        import json as _json

        state_rows = None
        for p in q.recentProgress:
            d = _json.loads(p.json) if hasattr(p, "json") else p
            ops = d.get("stateOperators") or []
            if ops and d.get("numInputRows"):
                state_rows = ops[0].get("numRowsTotal")
        got = (
            sink.read_committed(spark)
            .select("conv_id", "turn_idx", "wsum")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        return got, state_rows

    plain, plain_state = run("plain")
    chunked, chunked_state = run(
        "halo", hot_keys=[hot], chunk_span="5 minutes"
    )
    assert len(chunked) == len(plain) == 800
    pd.testing.assert_frame_equal(chunked, plain)
    # the hot key really was decomposed: more state groups than the
    # whole-key plan's one-per-conv (13 min of data / 5 min spans)
    assert chunked_state is not None and plain_state is not None
    assert chunked_state > plain_state


def test_sliding_agg_stream_multi_chunk_halo_matches_unchunked(
    spark, stream_dirs
):
    """The window-shared multi-aggregate stream under hot-key chunking:
    every monoid x duration column equal to the whole-key plan, across a
    micro-batch boundary, halo span taken from the LONGEST duration."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(700, 5)
    counts = pdf["conv_id"].value_counts()
    hots = list(counts.index[:2])
    _write_chunk(spark, src, pdf.iloc[:350], "c0")
    _write_chunk(spark, src, pdf.iloc[350:], "c1")

    def run(tag, **extra):
        stream = sliding_agg_stream_multi(
            _read_stream(spark, src),
            monoids=("sum", "max"),
            durations=("1 minutes", "2 minutes"),
            value_expr="length(text)",
            int_values=True,
            **extra,
        )
        q, sink = write_stream_exactly_once(
            stream, f"{out}_{tag}", f"{ckpt}_{tag}"
        )
        q.awaitTermination(180)
        got = (
            sink.read_committed(spark)
            .select("conv_id", "ts", "wsum_0", "wsum_1", "wmax_0", "wmax_1")
            .toPandas()
            .sort_values(["conv_id", "ts"])
            .reset_index(drop=True)
        )
        return got

    plain = run("plain")
    chunked = run("halo", hot_keys=hots, chunk_span="5 minutes")
    assert len(chunked) == len(plain) == 700
    pd.testing.assert_frame_equal(chunked, plain)


def test_chunk_halo_expired_chunk_state_removed(spark, stream_dirs):
    """Event-time timeout hygiene: once the watermark passes a chunk's
    end + 2x duration, that chunk's state group is REMOVED — chunked hot
    keys must not accrete one dead group per elapsed span forever."""
    import json as _json

    src, out, ckpt = stream_dirs
    early = transcripts_pandas(600, 4)  # ~10 min of event time
    late = transcripts_pandas(650, 4).iloc[600:].copy()
    late["ts"] = late["ts"] + pd.Timedelta(hours=8)  # watermark leap
    hot = early["conv_id"].value_counts().index[0]
    _write_chunk(spark, src, early, "c0")

    stream = sliding_agg_stream(
        _read_stream(spark, src),
        monoid_name="sum",
        value_expr="length(text)",
        duration="2 minutes",
        out_col="wsum",
        hot_keys=[hot],
        chunk_span="3 minutes",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(180)

    _write_chunk(spark, src, late, "c1")
    q2, sink2 = write_stream_exactly_once(
        sliding_agg_stream(
            _read_stream(spark, src),
            monoid_name="sum",
            value_expr="length(text)",
            duration="2 minutes",
            out_col="wsum",
            hot_keys=[hot],
            chunk_span="3 minutes",
        ),
        out,
        ckpt,
    )
    q2.awaitTermination(180)

    totals = []
    for p in q2.recentProgress:
        d = _json.loads(p.json) if hasattr(p, "json") else p
        ops = d.get("stateOperators") or []
        if ops:
            totals.append(
                (ops[0].get("numRowsTotal"), ops[0].get("numRowsRemoved"))
            )
    # the 8h-later batch advances the watermark past every early chunk's
    # deadline: groups are removed and the steady-state count collapses
    # to the cold convs + the single live chunk
    assert any((r or 0) > 0 for _t, r in totals)
    assert totals[-1][0] <= 4 + 2


@pytest.mark.skipif(
    not _tws_protocol_available(),
    reason="no google.protobuf wheel and the vendored mini-runtime failed "
    "to import",
)
def test_sliding_agg_stream_tws_chunk_halo_matches_plain(spark, stream_dirs):
    """Chunk-halo under the PRODUCTION arbitrary-state API: the TWS path
    with hot-key chunking (swag_ck/swag_halo columns, timer-based chunk
    expiry through RegisterTimer/handleExpiredTimer) must equal the
    whole-key applyInPandasWithState plan, over OOO arrivals spanning two
    micro-batches."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_tws,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(500, 6, ooo_distance=30, ooo_every=5)
    hot = pdf["conv_id"].value_counts().index[0]
    _write_chunk(spark, src, pdf.iloc[:250], "c0")
    _write_chunk(spark, src, pdf.iloc[250:], "c1")

    def run(factory, out_dir, ckpt_dir, **extra):
        stream = factory(
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*")),
            monoid_name="sum",
            value_expr="length(text)",
            duration="2 minutes",
            out_col="wsum",
            **extra,
        )
        q, sink = write_stream_exactly_once(stream, out_dir, ckpt_dir)
        q.awaitTermination(180)
        return (
            sink.read_committed(spark)
            .select("conv_id", "ts", "wsum")
            .toPandas()
            .sort_values(["conv_id", "ts", "wsum"])
            .reset_index(drop=True)
        )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got_tws = run(
            sliding_agg_stream_tws, out + "_twsh", ckpt + "_twsh",
            hot_keys=[hot], chunk_span="3 minutes",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got_plain = run(sliding_agg_stream, out + "_p", ckpt + "_p")

    assert len(got_tws) == len(got_plain) == 500
    pd.testing.assert_frame_equal(got_tws, got_plain)


@pytest.mark.skipif(
    not _tws_protocol_available(),
    reason="google.protobuf unavailable (no wheel, vendor failed)",
)
def test_replan_emit_filter_tws(spark, stream_dirs):
    """The zero-duplicate re-plan under the PRODUCTION arbitrary-state
    API: phase 1 drains c0 through the plain TWS plan; phase 2 re-plans
    with hot_keys + chunk_span + emit_filter over c0+c1 (the swag_mute
    column merging into swag_halo). Union equals the uninterrupted batch
    recompute."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_tws,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 8)
    hot = pdf["conv_id"].value_counts().idxmax()
    _write_chunk(spark, src, pdf.iloc[:200], "c0")

    kwargs = dict(
        monoid_name="sum", value_expr="length(text)",
        duration="3 minutes", out_col="wsum", int_values=True,
    )

    def run(out_dir, ckpt_dir, **extra):
        stream = sliding_agg_stream_tws(
            _read_stream(spark, src), **kwargs, **extra
        )
        q, sink = write_stream_exactly_once(stream, out_dir, ckpt_dir)
        q.awaitTermination(180)
        return (
            sink.read_committed(spark)
            .select("conv_id", "ts", "wsum")
            .toPandas()
        )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        p1 = run(out, ckpt)
        _write_chunk(spark, src, pdf.iloc[200:], "c1")
        p2 = run(
            out + "_replan", ckpt + "_replan",
            hot_keys=[hot], chunk_span="5 minutes",
            emit_filter="input_file_name() like '%/c1/%'",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    got = (
        pd.concat([p1, p2])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert not got.duplicated(["conv_id", "ts"]).any()
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy().astype(np.int64)
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - 180_000_000
            exp_rows.append((conv, g["ts"].iloc[i], int(lens[: i + 1][mask].sum())))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wsum"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum"].astype(int).tolist() == exp["wsum"].tolist()


def test_discover_hot_keys(spark):
    from sliding_window_aggregators_spark.streaming import discover_hot_keys

    rows = (
        [("c_hot", i) for i in range(60)]
        + [("b_warm", i) for i in range(25)]
        + [("a_warm", i) for i in range(25)]
        + [(f"k{i}", 0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long")
    # hottest-first, count ties broken by key value ascending
    assert discover_hot_keys(df, top_n=3) == ["c_hot", "a_warm", "b_warm"]
    # min_share filters: 60/120=0.5, 25/120~0.208, singles ~0.008
    assert discover_hot_keys(df, top_n=10, min_share=0.25) == ["c_hot"]
    assert (
        discover_hot_keys(df, top_n=10, min_share=0.1)
        == ["c_hot", "a_warm", "b_warm"]
    )
    # non-skewed input with a tight share threshold: nothing to chunk —
    # callers can wire the helper in unconditionally
    uniform = spark.createDataFrame(
        [(f"u{i}", j) for i in range(16) for j in range(4)],
        "conv_id string, turn_idx long",
    )
    assert discover_hot_keys(uniform, min_share=0.2) == []


def test_sliding_count_stream_top3(spark, tmp_path):
    """The order-statistic monoid through the streaming count window:
    3rd-longest turn text in the last 10 turns per conversation, replayed
    as two micro-batches, equal to a brute per-conversation fold
    (functions/monoids.py TopK — INT64_MIN sentinel while <3 turns)."""
    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.streaming import (
        sliding_count_stream,
        write_stream_exactly_once,
    )

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    pdf = transcripts_pandas(400, 12).reset_index(drop=True)
    _write_chunk(spark, str(src), pdf.iloc[:200], "c0")
    _write_chunk(spark, str(src), pdf.iloc[200:], "c1")

    W = 10
    stream = sliding_count_stream(
        _read_stream(spark, str(src)), monoid_name="top3",
        value_expr="length(text)", w=W, out_col="len3",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "len3")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    m = get_monoid("top3")
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        v = g["text"].str.len().to_numpy().astype(np.int64)
        for i in range(len(g)):
            win = v[max(0, i - W + 1) : i + 1]
            exp_rows.append((conv, g["ts"].iloc[i], int(m.lower1(m.lift_reduce(win)))))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "len3"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["len3"].astype("int64").tolist() == exp["len3"].tolist()
    # the sentinel really appears (first two turns of every conversation)
    assert (exp["len3"] == np.iinfo(np.int64).min).sum() == 2 * pdf["conv_id"].nunique()


def test_hot_keys_stream_matches_batch(spark, stream_dirs):
    """Streaming twin of discover_hot_keys: per tumbling window, the
    top-k most-active conversations (two chained stateful aggregations),
    replayed as two chunks plus a watermark sentinel, equal to a pandas
    recompute with the same (-count, key) tie-break."""
    from sliding_window_aggregators_spark.streaming import hot_keys_stream

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 20)
    far = pdf["ts"].max() + pd.Timedelta(days=1)
    sentinel = pd.DataFrame(
        {
            "conv_id": ["zz_sentinel"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["x"],
            "tool": pd.array([None], dtype="string"),
            "ts": [far],
        }
    )
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")
    _write_chunk(spark, src, sentinel, "c2")

    K = 5
    stream = hot_keys_stream(
        _read_stream(spark, src), window="2 minutes", top_n=K,
        watermark="2 minutes",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    got = (
        sink.read_committed(spark)
        .toPandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )

    win_us = 120_000_000
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
    buckets = (ts_us // win_us) * win_us
    exp_rows = []
    for b, g in pdf.assign(_b=buckets).groupby("_b"):
        cnt = g.groupby("conv_id").size().reset_index(name="n")
        cnt = cnt.sort_values(["n", "conv_id"], ascending=[False, True])
        exp_rows.append(
            (
                pd.Timestamp(b, unit="us"),
                cnt["conv_id"].head(K).tolist(),
                cnt["n"].head(K).astype("int64").tolist(),
            )
        )
    exp = (
        pd.DataFrame(exp_rows, columns=["win_start", "hot_keys", "hot_counts"])
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    # every real window closes under the sentinel; the sentinel's own
    # far-future window stays open and must NOT appear
    assert got["win_start"].tolist() == exp["win_start"].tolist()
    assert [list(x) for x in got["hot_keys"]] == exp["hot_keys"].tolist()
    assert [list(map(int, x)) for x in got["hot_counts"]] == exp["hot_counts"].tolist()
    # the detector feeds chunk-halo directly: its hottest key per window
    # is a real Zipf head (strictly more rows than the k-th entry somewhere)
    assert any(c[0] > c[-1] for c in exp["hot_counts"])


def test_dropped_late_counter(spark, stream_dirs):
    """The per-key admission rule's drops are observable: an accumulator
    passed as dropped_late_counter counts exactly the rows rejected as
    older than youngest − duration, and those rows emit no output."""
    src, out, ckpt = stream_dirs
    base = pd.Timestamp("2024-01-01")

    def mk(rows, start_idx=0):
        return pd.DataFrame(
            {
                "conv_id": ["c"] * len(rows),
                "turn_idx": np.arange(
                    start_idx, start_idx + len(rows), dtype=np.int32
                ),
                "role": ["user"] * len(rows),
                "text": ["x" * v for _, v in rows],
                "tool": ["t"] * len(rows),
                "ts": [base + pd.Timedelta(seconds=s) for s, _ in rows],
            }
        )

    # batch 1 ends at 200s. watermark 2 min → wm 80s (Spark's input
    # filter, which the EventTimeTimeout idle-GC mode enforces);
    # duration 60s → per-key admission horizon 140s (the engine's
    # stricter rule). batch 2 exercises all three strata: 150s
    # (admissible), 100s (inside the watermark but behind the per-key
    # horizon → ENGINE drops and counts), 30s (behind the watermark →
    # SPARK drops before the operator; the counter never sees it).
    _write_chunk(spark, src, mk([(0, 1), (100, 2), (200, 4)]), "c0")
    acc = spark.sparkContext.accumulator(0)

    def run():
        stream = sliding_agg_stream(
            _read_stream(spark, src), monoid_name="sum",
            value_expr="length(text)", duration="1 minute",
            watermark="2 minutes", out_col="wsum",
            id_cols=("turn_idx",), dropped_late_counter=acc,
        )
        q, sink = write_stream_exactly_once(stream, out, ckpt)
        q.awaitTermination(90)
        return sink

    run()
    assert acc.value == 0  # in-order batch drops nothing
    _write_chunk(spark, src, mk([(150, 8), (100, 16), (30, 32)], 3), "c1")
    sink = run()
    assert acc.value == 1  # exactly the engine-layer drop (100s)
    got = sink.read_committed(spark).toPandas()
    # 3 rows from batch 1 + only the admissible late row from batch 2
    assert len(got) == 4
    assert sorted(got["turn_idx"].tolist()) == [0, 1, 2, 3]


def test_audit_sink(spark, stream_dirs):
    """Lineage audit: a healthy checkpoint-resumed sink audits clean;
    planted corruptions (missing metrics, doctored per-file row counts,
    orphan uncommitted batch dir) are each detected."""
    import json
    import shutil

    from sliding_window_aggregators_spark.streaming import audit_sink

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 12)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")

    def run():
        stream = sliding_agg_stream(
            _read_stream(spark, src), monoid_name="sum",
            value_expr="length(text)", duration="2 minutes", out_col="wsum",
        )
        q, sink = write_stream_exactly_once(stream, out, ckpt)
        q.awaitTermination(90)
        return sink

    run()
    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    sink = run()
    rep = audit_sink(out)
    assert rep["ok"], rep
    assert rep["rows"] == sink.read_committed(spark).count() == len(pdf)
    assert rep["batches"] >= 2  # the resume really added batches

    # planted corruption 1: doctor a metrics file's per-file row count
    b0 = os.path.join(out, "_metrics", "batch_0.json")
    m = json.load(open(b0))
    key = next(iter(m["rows_per_file"]))
    m["rows_per_file"][key] += 1
    json.dump(m, open(b0, "w"))
    rep = audit_sink(out)
    assert not rep["ok"] and any("batch 0" in p for p in rep["problems"])
    m["rows_per_file"][key] -= 1
    json.dump(m, open(b0, "w"))

    # planted corruption 2: orphan uncommitted batch dir
    shutil.copytree(
        os.path.join(out, "batch_id=0"), os.path.join(out, "batch_id=999")
    )
    rep = audit_sink(out)
    assert not rep["ok"] and any("orphan" in p for p in rep["problems"])
    shutil.rmtree(os.path.join(out, "batch_id=999"))

    # planted corruption 3: missing metrics file
    os.rename(b0, b0 + ".bak")
    rep = audit_sink(out)
    assert not rep["ok"] and any("no metrics" in p for p in rep["problems"])
    os.rename(b0 + ".bak", b0)
    assert audit_sink(out)["ok"]
