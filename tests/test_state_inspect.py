"""Checkpoint state inspection via Spark's State Data Source
(SPARK-45511): operator lineage, distributed blob decode, the
bounded-state audit, batchId time travel, and native reads of
session-window and stream-stream-join state.

The point of these tests: the engine's retention claims ("ordered state
is evicted to youngest − 2·duration per key", engine.py
_ooo_sliding_step) stop being operator folklore — they are recomputed
here from the STATE FILES of a finished checkpoint, through the same
reader an operator would use against a live production job."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sliding_window_aggregators_spark.streaming import (
    assert_state_bounded,
    audit_state_bound,
    group_state_stats,
    read_state,
    session_stream,
    sliding_agg_stream,
    sliding_agg_stream_multi,
    state_operators,
    user_assistant_join,
)
from sliding_window_aggregators_spark.streaming.engine import (
    STATE_PARTITION_FLOOR,
    _interval_us,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

N_KEYS = 5
DURATION = "10 seconds"
DUR_US = _interval_us(DURATION)


def _turns(n, start_i=0):
    """Deterministic transcript chunk: key i%N_KEYS, ts on a 700 ms grid."""
    i = np.arange(start_i, start_i + n, dtype=np.int64)
    return pd.DataFrame(
        {
            "conv_id": np.char.add("c", (i % N_KEYS).astype(str)),
            "turn_idx": i.astype(np.int32),
            "role": np.where(i % 3 == 0, "assistant", "user"),
            "text": np.array(["t" * int(1 + k % 7) for k in i], dtype=object),
            "tool": None,
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(i * 700, unit="ms"),
        }
    )


def _drain(res, out, ckpt, mode="append"):
    q = (
        res.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.fixture(scope="module")
def agg_ckpt(spark, tmp_path_factory):
    """One sliding_agg_stream checkpoint drained over TWO micro-batch
    commits (chunk2 arrives after the first drain), plus the pandas
    frames needed to recompute expected state per key."""
    base = tmp_path_factory.mktemp("state_inspect")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    os.makedirs(src)
    c1, c2 = _turns(300), _turns(120, start_i=300)

    def stream():
        s = spark.readStream.schema(SCHEMA).option(
            "pathGlobFilter", "*.parquet"
        ).parquet(src + "/*")
        return sliding_agg_stream(
            s, monoid_name="sum", value_expr="length(text)",
            duration=DURATION, watermark="5 seconds",
        )

    spark.createDataFrame(c1, schema=SCHEMA).coalesce(1).write.parquet(src + "/chunk1")
    _drain(stream(), out, ckpt)
    # the EventTimeTimeout mode makes availableNow run an extra
    # watermark-advance batch per drain, so per-drain commit ids are
    # read back from state-metadata instead of assumed 0/1
    b1 = state_operators(spark, ckpt).collect()[0]["maxBatchId"]
    spark.createDataFrame(c2, schema=SCHEMA).coalesce(1).write.parquet(src + "/chunk2")
    _drain(stream(), out, ckpt)
    b2 = state_operators(spark, ckpt).collect()[0]["maxBatchId"]
    return ckpt, c1, c2, (b1, b2)


def _expected_state(frames):
    """Per-key retained rows after the engine's evict: ts ≥ youngest −
    2·duration (bulk_evict removes ts ≤ youngest − 2·duration − 1)."""
    pdf = pd.concat(frames, ignore_index=True)
    us = pdf["ts"].astype("datetime64[us]").astype(np.int64)
    exp = {}
    for key, grp in us.groupby(pdf["conv_id"]):
        youngest = int(grp.max())
        kept = grp[grp >= youngest - 2 * DUR_US]
        exp[key] = (len(kept), int(kept.min()), int(kept.max()))
    return exp


def test_metadata_lists_operator_and_partition_floor(spark, agg_ckpt):
    ckpt, _, _, _ = agg_ckpt
    meta = state_operators(spark, ckpt).collect()
    assert len(meta) == 1
    row = meta[0]
    assert row["operatorName"] == "applyInPandasWithState"
    # the §2 state-partition floor is frozen into the checkpoint
    assert row["numPartitions"] == STATE_PARTITION_FLOOR
    # two committed drains → batch range covers both
    assert row["minBatchId"] == 0 and row["maxBatchId"] >= 1


def test_group_state_stats_match_recompute(spark, agg_ckpt):
    ckpt, c1, c2, _ = agg_ckpt
    got = {
        r["key_json"]: r
        for r in group_state_stats(spark, ckpt).collect()
    }
    exp = _expected_state([c1, c2])
    assert set(got) == {f'{{"conv_id":"{k}"}}' for k in exp}
    for k, (rows, tmin, tmax) in exp.items():
        r = got[f'{{"conv_id":"{k}"}}']
        assert r["kind"] == "ordered"
        assert r["state_rows"] == rows
        assert (r["ts_min_us"], r["ts_max_us"]) == (tmin, tmax)
        assert r["span_us"] == tmax - tmin
        assert r["blob_bytes"] > 0


def test_batch_id_time_travel_shows_state_movement(spark, agg_ckpt):
    """Reading the same store at the first drain's commit must reproduce
    the state as of chunk1 only — while the latest read reflects both
    chunks (per-partition lineage, not just a latest snapshot)."""
    ckpt, c1, c2, (b1, _) = agg_ckpt
    at0 = {
        r["key_json"]: (r["state_rows"], r["ts_min_us"], r["ts_max_us"])
        for r in group_state_stats(spark, ckpt, batch_id=b1).collect()
    }
    exp0 = _expected_state([c1])
    assert at0 == {
        f'{{"conv_id":"{k}"}}': v for k, v in exp0.items()
    }
    assert exp0 != _expected_state([c1, c2])  # the travel is non-trivial


def test_audit_passes_at_engine_bound_and_flags_tighter_claim(spark, agg_ckpt):
    ckpt, _, _, _ = agg_ckpt
    n = assert_state_bounded(spark, ckpt, DURATION)
    assert n == N_KEYS
    # negative control: audit a claim the engine does NOT make (¼ the
    # duration) — the auditor must actually flag, not rubber-stamp
    tight = audit_state_bound(spark, ckpt, "2 seconds")
    assert tight.filter(~F.col("ok")).count() == N_KEYS
    with pytest.raises(AssertionError, match="exceed the retention bound"):
        assert_state_bounded(spark, ckpt, "2 seconds")


def test_multi_duration_blob_list_decodes(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)
    spark.createDataFrame(_turns(200), schema=SCHEMA).coalesce(1).write.parquet(src + "/chunk1")
    s = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    res = sliding_agg_stream_multi(
        s,
        monoids=("sum", "max"),
        durations=(DURATION, "20 seconds"),
        value_expr="length(text)",
        watermark="5 seconds",
    )
    _drain(res, out, ckpt)
    rows = group_state_stats(spark, ckpt).collect()
    assert len(rows) == N_KEYS
    assert all(r["kind"] == "ordered_multi" for r in rows)
    assert all(r["state_rows"] > 0 for r in rows)


def test_session_window_state_reads_native(spark, tmp_path):
    """Built-in stateful operators store typed rows — no blob: the open
    sessions' (start, end, count) come straight out of the checkpoint."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)
    pdf = _turns(200)
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.parquet(src + "/chunk1")
    s = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    # gap (5s) > per-key arrival spacing (3.5s): one open session per key
    _drain(session_stream(s, gap="5 seconds", watermark="5 seconds"), out, ckpt)
    st = read_state(spark, ckpt)
    got = (
        st.groupBy("key.conv_id")
        .agg(F.sum("value.count").alias("n"), F.count("*").alias("sessions"))
        .collect()
    )
    per_key = pdf.groupby("conv_id").size()
    assert {r["conv_id"]: r["n"] for r in got} == per_key.to_dict()
    assert all(r["sessions"] == 1 for r in got)


def test_join_state_reads_both_sides(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)
    spark.createDataFrame(_turns(200), schema=SCHEMA).coalesce(1).write.parquet(src + "/chunk1")
    s = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    _drain(
        user_assistant_join(s, horizon="10 seconds", watermark="5 seconds"),
        out, ckpt,
    )
    meta = state_operators(spark, ckpt)
    assert meta.filter(F.col("operatorName") == "symmetricHashJoin").count() == 4
    left = read_state(spark, ckpt, join_side="left")
    right = read_state(spark, ckpt, join_side="right")
    assert left.count() > 0 and right.count() > 0
    # the buffered rows are typed: user turns left, replies right
    assert "u_ts" in left.select("value.*").columns


def test_state_report_cli_fresh_session(agg_ckpt):
    """The ops case: a BRAND-NEW driver (subprocess, own JVM) inspects a
    checkpoint another session wrote. Regression for the lazy
    StateStoreCoordinator: without _ensure_state_coordinator the batch
    statestore read dies with CANNOT_LOAD_STATE_STORE /
    RpcEndpointNotFoundException in any session that never started a
    streaming query."""
    import subprocess
    import sys

    ckpt, c1, c2, _ = agg_ckpt
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "state_report.py"),
         ckpt, "--duration", DURATION, "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=repo,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert f"audit (2 x {DURATION}): OK" in r.stdout
    n_keys = pd.concat([c1, c2])["conv_id"].nunique()
    assert f"|{n_keys}   " in r.stdout  # keys row of the summary table


def test_hot_keys_from_state_ranks_retained_rows(spark, tmp_path):
    """State-side skew discovery ranks RETAINED rows (each key's live
    youngest - 2*duration horizon), not all-time volume: a dense recent
    key outranks a longer conversation whose history is evicted."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)
    base = pd.Timestamp("2026-01-01")
    frames = [_turns(150)]
    # c_old: most rows all-time, sparse tail -> thin retained horizon
    old_i = np.arange(400, dtype=np.int64)
    frames.append(pd.DataFrame({
        "conv_id": "c_old", "turn_idx": old_i.astype(np.int32),
        "role": "user", "text": "x", "tool": None,
        "ts": base + pd.to_timedelta(old_i * 200, unit="ms"),
    }))
    # c_hot: fewer rows overall but dense inside its final 2x-duration
    hot_i = np.arange(120, dtype=np.int64)
    frames.append(pd.DataFrame({
        "conv_id": "c_hot", "turn_idx": hot_i.astype(np.int32),
        "role": "user", "text": "x", "tool": None,
        "ts": base + pd.Timedelta(seconds=90)
        + pd.to_timedelta(hot_i * 120, unit="ms"),
    }))
    pdf = pd.concat(frames, ignore_index=True).sort_values("ts")
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.parquet(
        src + "/chunk1"
    )
    s = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    _drain(
        sliding_agg_stream(
            s, monoid_name="sum", value_expr="length(text)",
            duration=DURATION, watermark="5 seconds",
        ),
        out, ckpt,
    )
    from sliding_window_aggregators_spark.streaming import hot_keys_from_state

    # expected ranking from the SAME retention rule, recomputed in
    # pandas — minus the keys idle-GC removes (youngest + duration
    # behind the final watermark; c_old's sparse tail is exactly that)
    final_wm_us = int(
        pdf["ts"].astype("datetime64[us]").astype(np.int64).max()
    ) - 5_000_000
    exp = {
        k: v for k, v in _expected_state([pdf]).items()
        if v[2] + DUR_US >= final_wm_us
    }
    assert "c_old" not in exp and "c_hot" in exp  # scenario as designed
    order = sorted(exp, key=lambda k: (-exp[k][0], k))
    assert order[0] == "c_hot"
    got = hot_keys_from_state(spark, ckpt, top_n=3)
    assert got == order[:3], (got, order)
    total = sum(v[0] for v in exp.values())
    floor = [k for k in order if exp[k][0] / total >= 0.3]
    assert hot_keys_from_state(spark, ckpt, top_n=8, min_share=0.3) == floor


def test_tws_state_inspects_with_state_var(spark, tmp_path):
    """The production arbitrary-state API (transformWithStateInPandas +
    RocksDB) stores the SAME pickled OrderedAggState blob under a named
    ValueState; state_var='ordered' routes the whole inspection stack —
    stats, retention audit, hot keys, and the CLI's operatorProperties
    parse — at it."""
    from sliding_window_aggregators_spark.compat import protobuf_available

    if not protobuf_available():
        pytest.skip("no google.protobuf and the vendored runtime failed")
    from sliding_window_aggregators_spark.streaming import (
        hot_keys_from_state,
        sliding_agg_stream_tws,
    )

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)
    pdf = _turns(300)
    spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.parquet(
        src + "/chunk1"
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        s = spark.readStream.schema(SCHEMA).parquet(src + "/*")
        res = sliding_agg_stream_tws(
            s, monoid_name="sum", value_expr="length(text)",
            duration=DURATION, watermark="5 seconds",
        )
        _drain(res, out, ckpt)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    meta = state_operators(spark, ckpt).collect()
    assert meta[0]["operatorName"] == "transformWithStateInPandasExec"
    stats = {
        r["key_json"]: r
        for r in group_state_stats(spark, ckpt, state_var="ordered").collect()
    }
    exp = _expected_state([pdf])
    assert len(stats) == N_KEYS
    for key, (rows, tmin, tmax) in exp.items():
        r = stats[f'{{"conv_id":"{key}"}}']
        assert r["kind"] == "ordered"
        assert (r["state_rows"], r["ts_min_us"], r["ts_max_us"]) == (
            rows, tmin, tmax,
        )
    assert assert_state_bounded(spark, ckpt, DURATION, state_var="ordered") \
        == N_KEYS
    assert len(hot_keys_from_state(spark, ckpt, state_var="ordered",
                                   top_n=2)) == 2

    # the CLI discovers the ValueState from operatorProperties on its own
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "state_report.py"),
         ckpt, "--duration", DURATION, "--cpus", "4"],
        capture_output=True, text=True, timeout=420, cwd=repo,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "state_var 'ordered'" in r.stdout
    assert f"audit (2 x {DURATION}): OK" in r.stdout


def test_state_delta_between_commits(spark, agg_ckpt):
    """state_delta(0, 1) per key equals the difference of the pandas
    retention recomputes at each commit; verdict column classifies."""
    from sliding_window_aggregators_spark.streaming import state_delta

    ckpt, c1, c2, (b1, b2) = agg_ckpt
    got = {
        r["key_json"]: r for r in state_delta(spark, ckpt, b1, b2).collect()
    }
    e0, e1 = _expected_state([c1]), _expected_state([c1, c2])
    assert len(got) == N_KEYS
    for k in e0:
        r = got[f'{{"conv_id":"{k}"}}']
        assert (r["rows_a"], r["rows_b"]) == (e0[k][0], e1[k][0])
        assert r["d_rows"] == e1[k][0] - e0[k][0]
        assert r["d_span_us"] == (e1[k][2] - e1[k][1]) - (e0[k][2] - e0[k][1])
        exp_change = (
            "grew" if r["d_rows"] > 0 else
            "shrank" if r["d_rows"] < 0 else "steady"
        )
        assert r["change"] == exp_change
    # steady ROW COUNTS here (eviction balances admission on the 700 ms
    # grid) — the horizon itself must have advanced for every key
    for k in e0:
        r = got[f'{{"conv_id":"{k}"}}']
        assert r["advanced_us"] == e1[k][2] - e0[k][2] > 0


def test_blob_stats_never_crashes_on_garbage():
    """A corrupt or foreign state file must classify, not crash the
    auditor: arbitrary byte strings and arbitrary picklable objects all
    land in a known kind, and non-engine layouts fail closed (the audit
    marks them not-ok rather than skipping them)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sliding_window_aggregators_spark.streaming.state_inspect import (
        _blob_stats,
    )

    kinds = {"ordered", "ordered_multi", "panes", "opaque", "undecodable"}

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=64))
    def raw_bytes(b):
        kind, rows, tmin, tmax = _blob_stats(b)
        assert kind in kinds

    @settings(max_examples=200, deadline=None)
    @given(
        st.recursive(
            st.none() | st.integers() | st.text(max_size=5)
            | st.binary(max_size=8),
            lambda c: st.lists(c, max_size=3)
            | st.dictionaries(st.text(max_size=3), c, max_size=3),
            max_leaves=10,
        )
    )
    def pickled_objects(obj):
        import pickle

        kind, rows, tmin, tmax = _blob_stats(pickle.dumps(obj))
        assert kind in kinds
        if kind in ("opaque", "undecodable"):
            assert rows is None and tmin is None and tmax is None

    raw_bytes()
    pickled_objects()

    # the real layouts still classify as themselves (no false opaque)
    import pickle

    ordered = pickle.dumps(
        {"ts": np.array([1, 5], dtype=np.int64),
         "partials": {"s": np.array([2.0, 3.0])}, "v": 1}
    )
    assert _blob_stats(ordered) == ("ordered", 2, 1, 5)
    assert _blob_stats(pickle.dumps([ordered, ordered])) == (
        "ordered_multi", 4, 1, 5,
    )
    panes = pickle.dumps(
        {"pane_ts": np.array([10], dtype=np.int64), "partials": {},
         "last_emit": 0, "v": 1}
    )
    assert _blob_stats(panes) == ("panes", 1, 10, 10)


def test_blob_stats_non_integer_ts_is_opaque():
    """A dict that apes the engine layout with a non-integer ts axis
    must classify opaque (and so fail the audit closed), not crash on
    int(min())."""
    import pickle

    from sliding_window_aggregators_spark.streaming.state_inspect import (
        _blob_stats,
    )

    for ts in (np.array(["a", "b"], dtype=object),
               np.array([1.5, 2.5]),
               np.array([[1, 2]], dtype=np.int64)):
        blob = pickle.dumps({"ts": ts, "partials": {}, "v": 1})
        assert _blob_stats(blob) == ("opaque", None, None, None)
