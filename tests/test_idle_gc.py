"""Idle-key state GC: a conversation that goes quiet is REMOVED from
the state store once the event-time watermark strictly passes its
``youngest + duration`` — the point after which Spark's pre-stateful
watermark filter makes it impossible for any admissible future row's
window ``[ts − duration, ts]`` to reach the retained rows. Without this
the per-turn sliding paths kept every conversation ever seen forever
(O(all convs) state at 10^12 turns, vs O(live convs)); with it the
cleanup is EXACT, not heuristic: the revival tests pin that a key
returning after GC emits byte-identical values to a never-GC'd replay.

Verified from the checkpoint's state files (state_inspect), on all
three per-turn paths: applyInPandasWithState single + multi, and the
transformWithStateInPandas twin (timer protocol)."""

import os

import numpy as np
import pandas as pd
import pytest

from sliding_window_aggregators_spark.streaming import (
    group_state_stats,
    sliding_agg_stream,
    sliding_agg_stream_multi,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)
T0 = pd.Timestamp("2026-01-01")
DURATION = "10 seconds"
WATERMARK = "5 seconds"


def _rows(key, offsets_s, start_i=0):
    i = np.arange(start_i, start_i + len(offsets_s), dtype=np.int64)
    return pd.DataFrame(
        {
            "conv_id": key,
            "turn_idx": i.astype(np.int32),
            "role": "user",
            "text": ["y" * int(2 + k % 5) for k in i],
            "tool": None,
            "ts": [T0 + pd.Timedelta(seconds=o) for o in offsets_s],
        }
    )


# chunk0: both keys active; idle's youngest = +30 s → GC deadline +40 s
# chunk1: live only, wm reaches +90 s  > +40 s → idle's timer is due
# chunk2: live only — the batch in which the due timer FIRES
# chunk3: idle REVIVES at +150 s (window [140, 150] can't see old rows)
CHUNKS = [
    pd.concat(
        [_rows("idle", [0, 5, 20, 30]), _rows("live", [0, 10, 25])],
        ignore_index=True,
    ),
    _rows("live", [90, 95], start_i=3),
    _rows("live", [120], start_i=5),
    _rows("idle", [150, 152, 154], start_i=4),
]


def _drain_chunks(spark, tmp_path, stream_factory, n_chunks, snap=None):
    """One availableNow drain per chunk; ``snap(i)`` runs after drain i
    (used to snapshot the LATEST state between drains — batch numbering
    is Spark's business, the state trajectory is ours)."""
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    snaps = []
    for i in range(n_chunks):
        spark.createDataFrame(CHUNKS[i], schema=SCHEMA).coalesce(
            1
        ).write.parquet(f"{src}/c{i}")
        res = stream_factory(
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .parquet(src + "/*")
        )
        q = (
            res.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if snap is not None:
            snaps.append(snap(ckpt))
    return out, ckpt, snaps


def _state_keys(spark, ckpt, **kw):
    return {
        r["key_json"]: r["state_rows"]
        for r in group_state_stats(spark, ckpt, **kw).collect()
    }


def _expected_sum(frames):
    pdf = pd.concat(frames, ignore_index=True)
    us = pdf["ts"].astype("datetime64[us]").astype(np.int64)
    vals = pdf["text"].str.len().astype(float)
    out = {}
    for key, grp in pdf.groupby("conv_id"):
        t = us[grp.index].to_numpy()
        v = vals[grp.index].to_numpy()
        order = np.argsort(t, kind="mergesort")
        t, v = t[order], v[order]
        for tt in t:
            m = (t >= tt - 10_000_000) & (t <= tt)
            out[(key, tt)] = float(v[m].sum())
    return out


def test_idle_key_state_removed_then_exact_revival(spark, tmp_path):
    out, ckpt, snaps = _drain_chunks(
        spark, tmp_path,
        lambda s: sliding_agg_stream(
            s, monoid_name="sum", value_expr="length(text)",
            duration=DURATION, watermark=WATERMARK,
        ),
        n_chunks=4,
        snap=lambda ck: _state_keys(spark, ck),
    )
    # drain 0: both keys hold state (wm +25 s < idle's +40 s deadline)
    assert set(snaps[0]) == {'{"conv_id":"idle"}', '{"conv_id":"live"}'}
    # drain 1 pushes wm to +90 s — the due timer fires and idle is
    # REMOVED from the store (Spark evicts with the batch's own wm)
    assert set(snaps[1]) == {'{"conv_id":"live"}'}
    assert set(snaps[2]) == {'{"conv_id":"live"}'}
    # drain 3: revival re-created fresh state with ONLY the new rows
    # (wm +149 s has meanwhile GC'd live, youngest +120 s, too)
    assert snaps[3] == {'{"conv_id":"idle"}': 3}
    # and every emitted value (including post-GC revival) is exact
    got = spark.read.parquet(out).toPandas()
    exp = _expected_sum(CHUNKS)
    assert len(got) == sum(len(c) for c in CHUNKS)
    for r in got.itertuples():
        tt = pd.Timestamp(r.ts).to_datetime64().astype(
            "datetime64[us]"
        ).astype(np.int64)
        assert exp[(r.conv_id, int(tt))] == r.wagg, (r.conv_id, r.ts)


def test_idle_gc_multi_path(spark, tmp_path):
    out, ckpt, snaps = _drain_chunks(
        spark, tmp_path,
        lambda s: sliding_agg_stream_multi(
            s, monoids=("sum", "max"), durations=(DURATION,),
            value_expr="length(text)", watermark=WATERMARK,
        ),
        n_chunks=3,
        snap=lambda ck: _state_keys(spark, ck),
    )
    assert set(snaps[0]) == {'{"conv_id":"idle"}', '{"conv_id":"live"}'}
    assert set(snaps[1]) == {'{"conv_id":"live"}'}
    assert set(snaps[2]) == {'{"conv_id":"live"}'}


def test_idle_gc_tws_path(spark, tmp_path):
    from sliding_window_aggregators_spark.compat import protobuf_available

    if not protobuf_available():
        pytest.skip("no google.protobuf and the vendored runtime failed")
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out, ckpt, snaps = _drain_chunks(
            spark, tmp_path,
            lambda s: sliding_agg_stream_tws(
                s, monoid_name="sum", value_expr="length(text)",
                duration=DURATION, watermark=WATERMARK,
            ),
            n_chunks=4,
            snap=lambda ck: _state_keys(
                spark, ck, state_var="ordered"
            ),
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert set(snaps[0]) == {'{"conv_id":"idle"}', '{"conv_id":"live"}'}
    # idle GC'd by the fired event-time timer, then exact revival
    assert '{"conv_id":"idle"}' not in snaps[2]
    assert snaps[3]['{"conv_id":"idle"}'] == 3
    got = spark.read.parquet(out).toPandas()
    exp = _expected_sum(CHUNKS)
    assert len(got) == sum(len(c) for c in CHUNKS)
    for r in got.itertuples():
        tt = pd.Timestamp(r.ts).to_datetime64().astype(
            "datetime64[us]"
        ).astype(np.int64)
        assert exp[(r.conv_id, int(tt))] == r.wagg
