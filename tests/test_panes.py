"""Pane-sliced sliding windows (`sliding_panes_stream`): bounded-state
Flink-style (size, slide) windows over the transcripts stream.

Offline tests drive the pure `_panes_step` kernel directly (state bound,
late rule, OOO merge, emission set); Spark tests check the streaming
operator against a pandas pane recompute across micro-batch boundaries,
quiet-key closure via event-time timeout, and checkpoint resume."""

import os

import numpy as np
import pandas as pd
import pytest

from sliding_window_aggregators_spark.functions.monoids import get_monoid
from sliding_window_aggregators_spark.sources import transcripts_pandas
from sliding_window_aggregators_spark.streaming import sliding_panes_stream
from sliding_window_aggregators_spark.streaming.engine import (
    _panes_empty_state,
    _panes_step,
)

US = 1_000_000
SLIDE = 60 * US  # 1 minute panes
SIZE = 4 * SLIDE  # 4-pane windows


def _mkpdf(ts_us, vals):
    return pd.DataFrame(
        {
            "ts": np.asarray(ts_us, dtype=np.int64).astype("datetime64[us]"),
            "__v": np.asarray(vals, dtype=np.float64),
        }
    )


def _brute_windows(ts_us, vals, size_us=SIZE, slide_us=SLIDE, fold=sum):
    """Expected emitted set: every (window_end, fold) where the window
    [end-size, end) holds >= 1 row; ends are slide multiples reachable
    from an occupied pane."""
    ts_us = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    panes = ts_us - ts_us % slide_us
    ends = set()
    for p in np.unique(panes):
        for k in range(1, size_us // slide_us + 1):
            ends.add(int(p + k * slide_us))
    out = {}
    order = np.argsort(ts_us, kind="mergesort")
    for e in sorted(ends):
        m = (ts_us >= e - size_us) & (ts_us < e)
        if m.any():
            sel = order[m[order]]
            out[e] = fold(vals[sel].tolist())
    return out


def _drive(batches, wms, monoid=None, counter=None):
    """Run _panes_step over (batch, watermark) pairs; collect emissions."""
    monoid = monoid or get_monoid("sum")
    d = _panes_empty_state(monoid)
    got = {}
    for pdf, wm in zip(batches, wms):
        emitted, d = _panes_step(
            d, pdf, wm, monoid=monoid, ts_col="ts", size_us=SIZE,
            slide_us=SLIDE, int_values=False, drop_counter=counter,
        )
        if emitted is not None:
            for e, v in zip(emitted["window_end"], emitted["values"]):
                assert int(e) not in got, "window emitted twice"
                got[int(e)] = v
    return got, d


def test_panes_step_matches_brute_in_order():
    rng = np.random.default_rng(7)
    ts = np.sort(rng.integers(0, 20 * SLIDE, size=400).astype(np.int64))
    vals = rng.integers(1, 100, size=400).astype(np.float64)
    # three batches, watermark trailing then flushing everything
    cut1, cut2 = 150, 300
    batches = [
        _mkpdf(ts[:cut1], vals[:cut1]),
        _mkpdf(ts[cut1:cut2], vals[cut1:cut2]),
        _mkpdf(ts[cut2:], vals[cut2:]),
        None,
    ]
    wms = [int(ts[cut1 - 1]) - 2 * SLIDE, int(ts[cut2 - 1]) - 2 * SLIDE,
           int(ts[-1]) - 2 * SLIDE, int(ts[-1]) + SIZE + SLIDE]
    got, d = _drive(batches, wms)
    exp = _brute_windows(ts, vals)
    assert got == exp
    assert len(d["pane_ts"]) == 0  # everything closed and evicted


def test_panes_step_ooo_commutative_matches_brute():
    """Scrambled arrival (in-watermark): same emitted set and values."""
    rng = np.random.default_rng(11)
    ts = rng.integers(0, 12 * SLIDE, size=300).astype(np.int64)
    vals = rng.integers(1, 50, size=300).astype(np.float64)
    perm = rng.permutation(300)
    cut = 150
    batches = [
        _mkpdf(ts[perm[:cut]], vals[perm[:cut]]),
        _mkpdf(ts[perm[cut:]], vals[perm[cut:]]),
        None,
    ]
    # watermark held at 0 until all rows are in, then flush
    wms = [0, 0, int(ts.max()) + SIZE + SLIDE]
    got, _ = _drive(batches, wms)
    assert got == _brute_windows(ts, vals)


def test_panes_step_max_monoid():
    rng = np.random.default_rng(3)
    ts = np.sort(rng.integers(0, 10 * SLIDE, size=200).astype(np.int64))
    vals = rng.integers(1, 1000, size=200).astype(np.float64)
    got, _ = _drive(
        [_mkpdf(ts, vals), None],
        [0, int(ts.max()) + SIZE + SLIDE],
        monoid=get_monoid("max"),
    )
    assert got == _brute_windows(ts, vals, fold=max)


def test_panes_step_noncommutative_in_order():
    """adjsum (segment-concatenation, non-commutative): exact under
    in-order arrival across batch boundaries."""
    monoid = get_monoid("adjsum")
    rng = np.random.default_rng(5)
    ts = np.sort(rng.integers(0, 8 * SLIDE, size=120).astype(np.int64))
    vals = rng.integers(1, 9, size=120).astype(np.float64)

    def adj_fold(xs):
        return float(sum(a * b for a, b in zip(xs, xs[1:])))

    got, _ = _drive(
        [_mkpdf(ts[:60], vals[:60]), _mkpdf(ts[60:], vals[60:]), None],
        [0, 0, int(ts.max()) + SIZE + SLIDE],
        monoid=monoid,
    )
    assert got == _brute_windows(ts, vals, fold=adj_fold)


def test_panes_step_late_row_dropped_and_counted():
    class Counter:
        n = 0

        def add(self, k):
            self.n += k

    c = Counter()
    ts0 = np.arange(0, 6 * SLIDE, SLIDE // 2, dtype=np.int64)
    vals0 = np.ones(len(ts0))
    monoid = get_monoid("sum")
    d = _panes_empty_state(monoid)
    # close everything up to 4*SLIDE
    _, d = _panes_step(
        d, _mkpdf(ts0, vals0), 4 * SLIDE, monoid=monoid, ts_col="ts",
        size_us=SIZE, slide_us=SLIDE, int_values=False, drop_counter=c,
    )
    assert d["last_emit"] == 4 * SLIDE
    # a row in pane 0: its last window ends at 0 + SIZE = 4*SLIDE <= closed
    _, d = _panes_step(
        d, _mkpdf([SLIDE // 4], [99.0]), 4 * SLIDE, monoid=monoid,
        ts_col="ts", size_us=SIZE, slide_us=SLIDE, int_values=False,
        drop_counter=c,
    )
    assert c.n == 1
    # a row in pane 1 still reaches windows ending 5..8*SLIDE: admitted
    before = c.n
    _, d = _panes_step(
        d, _mkpdf([SLIDE + 1], [7.0]), 4 * SLIDE, monoid=monoid,
        ts_col="ts", size_us=SIZE, slide_us=SLIDE, int_values=False,
        drop_counter=c,
    )
    assert c.n == before


def test_panes_state_bounded_by_panes_not_rows():
    """50k rows in 6 panes -> state holds <= 6 pane partials (the whole
    point: per-key state independent of the turn rate)."""
    rng = np.random.default_rng(13)
    n = 50_000
    ts = np.sort(rng.integers(0, 6 * SLIDE, size=n).astype(np.int64))
    vals = np.ones(n)
    monoid = get_monoid("sum")
    d = _panes_empty_state(monoid)
    _, d = _panes_step(
        d, _mkpdf(ts, vals), 0, monoid=monoid, ts_col="ts",
        size_us=SIZE, slide_us=SLIDE, int_values=False,
    )
    assert len(d["pane_ts"]) <= 6
    # eviction: advancing the watermark past pane0's last window drops it
    _, d = _panes_step(
        d, None, 5 * SLIDE, monoid=monoid, ts_col="ts",
        size_us=SIZE, slide_us=SLIDE, int_values=False,
    )
    assert (d["pane_ts"] + SIZE > d["last_emit"]).all()


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _write_chunk(spark, src_dir, pdf, name):
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, name)
    )


def _read_stream(spark, src_dir):
    # one file per trigger: each chunk is its own micro-batch, so the
    # tests exercise cross-batch pane carry and watermark closure
    return (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )


def _expected_panes(pdf, size_us, slide_us):
    rows = []
    for conv, g in pdf.groupby("conv_id"):
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g["text"].str.len().to_numpy().astype(np.float64)
        for e, v in _brute_windows(ts, vals, size_us, slide_us).items():
            rows.append((conv, e - size_us, e, float(v)))
    return (
        pd.DataFrame(rows, columns=["conv_id", "ws", "we", "wagg"])
        .sort_values(["conv_id", "we"])
        .reset_index(drop=True)
    )


def _got_sink(spark, out):
    got = (
        spark.read.parquet(out)
        .selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            "wagg",
        )
        .toPandas()
        .sort_values(["conv_id", "we"])
        .reset_index(drop=True)
    )
    return got


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(out), str(ckpt)


def test_sliding_panes_stream_matches_batch(spark, stream_dirs):
    """2-chunk replay + flush sentinel == pandas pane recompute, including
    windows whose panes span the micro-batch boundary."""
    from sliding_window_aggregators_spark.streaming import (
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 12)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    stream = sliding_panes_stream(
        _read_stream(spark, src),
        size="4 minutes", slide="1 minute", watermark="0 seconds",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(180)

    got = _got_sink(spark, out)
    got = got[got["conv_id"] != "__flush"].reset_index(drop=True)
    exp = _expected_panes(pdf, 4 * SLIDE, SLIDE)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()


def test_sliding_panes_quiet_key_closes_by_timeout(spark, stream_dirs):
    """A key that stops sending still closes its windows when ANOTHER
    key's rows advance the global watermark — the event-time timeout."""
    from sliding_window_aggregators_spark.streaming import (
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(conv, minutes):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": range(len(minutes)),
                "role": "user",
                "text": ["x" * 10] * len(minutes),
                "tool": "",
                "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
            }
        )

    # c0: quiet after minute 2 (chunk 0 only). c1: keeps talking.
    _write_chunk(spark, src, rows("c0", [0, 1, 2]), "b0")
    _write_chunk(spark, src, rows("c1", [0, 1, 2, 3]), "b1")
    _write_chunk(spark, src, rows("c1", [30, 31]), "b2")  # advances wm
    _write_chunk(spark, src, rows("c1", [60]), "b3")

    stream = sliding_panes_stream(
        _read_stream(spark, src),
        size="4 minutes", slide="1 minute", watermark="0 seconds",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(180)

    got = _got_sink(spark, out)
    c0 = got[got["conv_id"] == "c0"]
    # all of c0's windows (ends minute 1..6) must have closed without any
    # further c0 input: 3 rows in panes 0,1,2 -> 6 nonempty windows
    assert len(c0) == 6
    t0 = base.value // 1000
    assert c0["we"].tolist() == [t0 + (m + 1) * 60 * US for m in range(6)]
    assert c0["wagg"].tolist() == [10.0, 20.0, 30.0, 30.0, 20.0, 10.0]


def test_sliding_panes_checkpoint_resume_exactly_once(spark, stream_dirs):
    """Stop after chunk 0, restart over chunk 1 + flush: the union of the
    two runs' sinks equals the uninterrupted recompute, no duplicates."""
    from sliding_window_aggregators_spark.streaming import (
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 8)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")

    def start():
        stream = sliding_panes_stream(
            _read_stream(spark, src),
            size="4 minutes", slide="1 minute", watermark="0 seconds",
        )
        return write_stream_exactly_once(stream, out, ckpt)

    q, _ = start()
    q.awaitTermination(120)

    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")
    q, _ = start()
    q.awaitTermination(120)

    got = _got_sink(spark, out)
    got = got[got["conv_id"] != "__flush"].reset_index(drop=True)
    assert not got.duplicated(["conv_id", "we"]).any()
    exp = _expected_panes(pdf, 4 * SLIDE, SLIDE)
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()


def test_sliding_panes_vs_duckdb_oracle(spark, stream_dirs):
    """Cross-engine value check (the pytest-level oracle pattern for
    queries outside the 50-slot driver registry): the drained pane-window
    sink must equal DuckDB's pane-sum cross-join recompute exactly."""
    import duckdb

    from sliding_window_aggregators_spark.streaming import (
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(2000, 30)
    _write_chunk(spark, src, pdf.iloc[:700], "c0")
    _write_chunk(spark, src, pdf.iloc[700:1400], "c1")
    _write_chunk(spark, src, pdf.iloc[1400:], "c2")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c3f")

    stream = sliding_panes_stream(
        _read_stream(spark, src),
        size="4 minutes", slide="1 minute", watermark="0 seconds",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(240)

    got = _got_sink(spark, out)
    got = got[got["conv_id"] != "__flush"].reset_index(drop=True)

    n_panes, slide_us, size_us = 4, SLIDE, SIZE
    exp = duckdb.connect().execute(f"""
        with rows as (
          select conv_id, ts, cast(length(text) as double) v
          from read_parquet('{src}/c*/*.parquet')
          where conv_id <> '__flush'
        ),
        panes as (
          select conv_id,
                 (epoch_us(ts) // {slide_us}) * {slide_us} as p,
                 sum(v) as s
          from rows group by 1, 2
        ),
        contrib as (
          select conv_id, p + k.range * {slide_us} as we, s
          from panes, range(1, {n_panes} + 1) k
        )
        select conv_id, we - {size_us} as ws, we, sum(s) as wagg
        from contrib group by 1, 2, 3 order by 1, 3
    """).df()
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()


def test_sliding_panes_rejects_non_multiple():
    # size/slide validation fires before the DataFrame is touched
    with pytest.raises(ValueError, match="multiple"):
        sliding_panes_stream(None, size="5 minutes", slide="2 minutes")


@pytest.mark.slow
def test_streaming_job_panes_mode(spark, stream_dirs):
    """--panes through the LAUNCH ARTIFACT (own process, the spark-submit
    shape): drained pane-window sink equals the pandas pane recompute, and
    the mode guards reject composing it with the per-turn-only flags."""
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 8)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    r = subprocess.run(
        [
            _sys.executable, os.path.join(root, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now", "--panes", "4 minutes",
            "--slide", "1 minute", "--watermark", "0 seconds",
            "--max-files-per-trigger", "1",
        ],
        capture_output=True, text=True, cwd=root, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dropped late rows: 0" in r.stderr

    got = _got_sink(spark, out)
    got = got[got["conv_id"] != "__flush"].reset_index(drop=True)
    exp = _expected_panes(pdf, SIZE, SLIDE)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()

    bad = subprocess.run(
        [
            _sys.executable, os.path.join(root, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--panes", "4 minutes", "--tws",
        ],
        capture_output=True, text=True, cwd=root, timeout=120,
    )
    assert bad.returncode == 2 and "--panes" in bad.stderr


# --------------------------------------------------------------------------
# Shared-pane multi-aggregate (N monoids x K sizes over one pane layer)
# --------------------------------------------------------------------------


def _drive_multi(batches, wms, monoids, val_cols, sizes_us, counter=None):
    """Run _panes_multi_step over (batch, watermark) pairs; collect one
    {window_end: (v_spec0, v_spec1, ...)} dict per size."""
    from sliding_window_aggregators_spark.streaming.engine import (
        _PANES_NEG,
        _panes_multi_step,
    )

    d = {
        "pane_ts": np.empty(0, np.int64),
        "partials": [m.identity(0) for m in monoids],
        "last_emit": _PANES_NEG,
        "v": 1,
    }
    got = [{} for _ in sizes_us]
    for pdf, wm in zip(batches, wms):
        per_size, d = _panes_multi_step(
            d, pdf, wm, monoids=monoids, val_cols=val_cols, ts_col="ts",
            sizes_us=sizes_us, slide_us=SLIDE,
            int_flags=[False] * len(monoids), drop_counter=counter,
        )
        for k, emitted in enumerate(per_size):
            if emitted is None:
                continue
            for j, e in enumerate(emitted["window_end"]):
                assert int(e) not in got[k], "window emitted twice"
                got[k][int(e)] = tuple(
                    v[j] for v in emitted["values"]
                )
    return got, d


def _mkpdf2(ts_us, v0, v1):
    return pd.DataFrame(
        {
            "ts": np.asarray(ts_us, dtype=np.int64).astype("datetime64[us]"),
            "__v0": np.asarray(v0, dtype=np.float64),
            "__v1": np.asarray(v1, dtype=np.float64),
        }
    )


def test_panes_multi_step_matches_brute_ooo():
    """(sum over v0, max over v1) x sizes (2, 4 panes), scrambled
    in-watermark arrival across three batches == per-size per-spec brute."""
    rng = np.random.default_rng(17)
    n = 500
    ts = rng.integers(0, 18 * SLIDE, size=n).astype(np.int64)
    v0 = rng.integers(1, 100, size=n).astype(np.float64)
    v1 = rng.integers(1, 1000, size=n).astype(np.float64)
    perm = rng.permutation(n)
    cuts = [0, 180, 360, n]
    batches = [
        _mkpdf2(ts[perm[a:b]], v0[perm[a:b]], v1[perm[a:b]])
        for a, b in zip(cuts, cuts[1:])
    ] + [None]
    wms = [0, 0, 0, int(ts.max()) + 4 * SLIDE + SLIDE]
    monoids = [get_monoid("sum"), get_monoid("max")]
    sizes_us = [2 * SLIDE, 4 * SLIDE]
    got, d = _drive_multi(batches, wms, monoids, ["__v0", "__v1"], sizes_us)
    for k, size_us in enumerate(sizes_us):
        exp_sum = _brute_windows(ts, v0, size_us, SLIDE, fold=sum)
        exp_max = _brute_windows(ts, v1, size_us, SLIDE, fold=max)
        assert {e: v[0] for e, v in got[k].items()} == exp_sum
        assert {e: v[1] for e, v in got[k].items()} == exp_max
    assert len(d["pane_ts"]) == 0  # everything closed and evicted


def test_panes_multi_single_spec_equals_single_step():
    """One spec + one size through the multi kernel == _panes_step (the
    wrapper identity, checked end-to-end through the drive harness)."""
    rng = np.random.default_rng(23)
    n = 300
    ts = np.sort(rng.integers(0, 12 * SLIDE, size=n).astype(np.int64))
    vals = rng.integers(1, 50, size=n).astype(np.float64)
    single, _ = _drive(
        [_mkpdf(ts[:150], vals[:150]), _mkpdf(ts[150:], vals[150:]), None],
        [6 * SLIDE, 9 * SLIDE, int(ts.max()) + SIZE + SLIDE],
    )
    multi, _ = _drive_multi(
        [
            _mkpdf2(ts[:150], vals[:150], vals[:150]),
            _mkpdf2(ts[150:], vals[150:], vals[150:]),
            None,
        ],
        [6 * SLIDE, 9 * SLIDE, int(ts.max()) + SIZE + SLIDE],
        [get_monoid("sum")], ["__v0"], [SIZE],
    )
    assert {e: v[0] for e, v in multi[0].items()} == single


def test_panes_multi_late_rule_keys_to_max_size():
    """A row late for the SMALL size but alive for the LARGE folds in
    without a drop: large-size windows include it, and the small size's
    already-closed windows stay closed (no re-emission)."""

    class Counter:
        n = 0

        def add(self, k):
            self.n += k

    c = Counter()
    monoids = [get_monoid("sum")]
    sizes_us = [2 * SLIDE, 6 * SLIDE]
    ts0 = np.arange(0, 8 * SLIDE, SLIDE // 2, dtype=np.int64)
    got, d = _drive_multi(
        [_mkpdf2(ts0, np.ones(len(ts0)), np.ones(len(ts0)))],
        [4 * SLIDE],
        monoids, ["__v0"], sizes_us, counter=c,
    )
    assert d["last_emit"] == 4 * SLIDE
    # pane 1 row: small-size windows end <= 1*SLIDE+2*SLIDE = 3*SLIDE
    # (all closed), but the 6-pane window ending 7*SLIDE is still open
    from sliding_window_aggregators_spark.streaming.engine import (
        _panes_multi_step,
    )

    per_size, d = _panes_multi_step(
        d, _mkpdf2([SLIDE + 1], [100.0], [100.0]), 4 * SLIDE,
        monoids=monoids, val_cols=["__v0"], ts_col="ts",
        sizes_us=sizes_us, slide_us=SLIDE, int_flags=[False],
        drop_counter=c,
    )
    assert c.n == 0  # admitted: its largest window is still open
    assert per_size == [None, None]  # nothing newly closable
    # flush: the large windows covering pane 1 carry the late 100
    per_size, d = _panes_multi_step(
        d, None, 16 * SLIDE, monoids=monoids, val_cols=["__v0"],
        ts_col="ts", sizes_us=sizes_us, slide_us=SLIDE, int_flags=[False],
        drop_counter=c,
    )
    big = dict(zip(per_size[1]["window_end"], per_size[1]["values"][0]))
    assert big[7 * SLIDE] >= 100.0
    # small size never re-emits an end <= 4*SLIDE
    assert all(e > 4 * SLIDE for e in per_size[0]["window_end"])
    # a TRULY late row (pane 0, largest window closed after the flush) drops
    _, d = _panes_multi_step(
        d, _mkpdf2([1], [5.0], [5.0]), 16 * SLIDE, monoids=monoids,
        val_cols=["__v0"], ts_col="ts", sizes_us=sizes_us, slide_us=SLIDE,
        int_flags=[False], drop_counter=c,
    )
    assert c.n == 1


def test_panes_multi_state_bounded_and_evicts_by_max_size():
    rng = np.random.default_rng(29)
    n = 20_000
    ts = np.sort(rng.integers(0, 6 * SLIDE, size=n).astype(np.int64))
    monoids = [get_monoid("sum"), get_monoid("max")]
    sizes_us = [2 * SLIDE, 4 * SLIDE]
    _, d = _drive_multi(
        [_mkpdf2(ts, np.ones(n), np.ones(n)), None],
        [0, 5 * SLIDE],
        monoids, ["__v0", "__v1"], sizes_us,
    )
    assert len(d["pane_ts"]) <= 6
    # eviction keys to the LARGEST size
    assert (d["pane_ts"] + 4 * SLIDE > d["last_emit"]).all()
    for sp in d["partials"]:
        for arr in sp.values():
            assert len(arr) == len(d["pane_ts"])


def test_sliding_panes_stream_multi_matches_batch(spark, stream_dirs):
    """(sum(length(text)), max(turn_idx)) x (2m, 4m) windows through ONE
    stateful operator across a micro-batch boundary == per-size pandas
    pane recompute."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_panes_stream_multi,
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 12)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    stream = sliding_panes_stream_multi(
        _read_stream(spark, src),
        monoids=("sum", "max"),
        value_exprs=("length(text)", "cast(turn_idx as double)"),
        sizes=("2 minutes", "4 minutes"),
        slide="1 minute", watermark="0 seconds",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(240)

    got = (
        spark.read.parquet(out)
        .selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            "wsum", "wmax",
        )
        .toPandas()
    )
    got = got[got["conv_id"] != "__flush"]
    for size_us in (2 * SLIDE, 4 * SLIDE):
        gk = (
            got[got["we"] - got["ws"] == size_us]
            .sort_values(["conv_id", "we"])
            .reset_index(drop=True)
        )
        rows = []
        for conv, g in pdf.groupby("conv_id"):
            ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            lens = g["text"].str.len().to_numpy().astype(np.float64)
            idxs = g["turn_idx"].to_numpy().astype(np.float64)
            es = _brute_windows(ts, lens, size_us, SLIDE, fold=sum)
            em = _brute_windows(ts, idxs, size_us, SLIDE, fold=max)
            for e in sorted(es):
                rows.append((conv, e, float(es[e]), float(em[e])))
        exp = pd.DataFrame(rows, columns=["conv_id", "we", "wsum", "wmax"])
        assert gk["conv_id"].tolist() == exp["conv_id"].tolist()
        assert gk["we"].tolist() == exp["we"].tolist()
        assert gk["wsum"].tolist() == exp["wsum"].tolist()
        assert gk["wmax"].tolist() == exp["wmax"].tolist()


@pytest.mark.parametrize("pre_combine", [False, True],
                         ids=["raw", "pre_combine"])
def test_streaming_job_panes_multi_mode(spark, stream_dirs, pre_combine):
    """--panes + --multi-monoids through the LAUNCH ARTIFACT (both the
    raw ingestion path and --pre-combine's map-side pane partials): the
    shared-pane multi-aggregate rollup ((sum, max) x (2m, 4m)) drains to
    a sink equal to the per-size pandas pane recompute."""
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(400, 8)
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    r = subprocess.run(
        [
            _sys.executable, os.path.join(root, "jobs", "streaming_job.py"),
            "--source", src, "--out", out, "--checkpoint", ckpt,
            "--available-now", "--panes", "2 minutes",
            "--slide", "1 minute", "--watermark", "0 seconds",
            "--multi-monoids", "sum,max",
            "--multi-durations", "4 minutes",
            "--multi-value-exprs",
            "length(text);cast(turn_idx as double)",
            "--max-files-per-trigger", "1",
        ] + (["--pre-combine"] if pre_combine else []),
        capture_output=True, text=True, cwd=root, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dropped late rows: 0" in r.stderr

    got = (
        spark.read.parquet(out)
        .selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            "wsum", "wmax",
        )
        .toPandas()
    )
    got = got[got["conv_id"] != "__flush"]
    for size_us in (2 * SLIDE, 4 * SLIDE):
        gk = (
            got[got["we"] - got["ws"] == size_us]
            .sort_values(["conv_id", "we"])
            .reset_index(drop=True)
        )
        rows = []
        for conv, g in pdf.groupby("conv_id"):
            ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            lens = g["text"].str.len().to_numpy().astype(np.float64)
            idxs = g["turn_idx"].to_numpy().astype(np.float64)
            es = _brute_windows(ts, lens, size_us, SLIDE, fold=sum)
            em = _brute_windows(ts, idxs, size_us, SLIDE, fold=max)
            for e in sorted(es):
                rows.append((conv, e, float(es[e]), float(em[e])))
        exp = pd.DataFrame(rows, columns=["conv_id", "we", "wsum", "wmax"])
        assert gk["conv_id"].tolist() == exp["conv_id"].tolist()
        assert gk["we"].tolist() == exp["we"].tolist()
        assert gk["wsum"].tolist() == exp["wsum"].tolist()
        assert gk["wmax"].tolist() == exp["wmax"].tolist()


@pytest.mark.skipif(
    os.environ.get("SWAG_SKIP_TWS") == "1",
    reason="explicitly skipped via SWAG_SKIP_TWS",
)
def test_sliding_panes_stream_tws_matches_apply_path(spark, stream_dirs):
    """The pane-sliced rollup state under the PRODUCTION arbitrary-state
    API (transformWithStateInPandas + RocksDB + real event-time timers)
    must emit exactly what the applyInPandasWithState path emits — same
    windows, same values, across a micro-batch boundary and through a
    quiet-key timer closure (both APIs drive _panes_multi_step)."""
    from sliding_window_aggregators_spark.compat import protobuf_available

    if not protobuf_available():
        pytest.skip("no google.protobuf and the vendored runtime failed")
    from sliding_window_aggregators_spark.streaming import (
        sliding_panes_stream_tws,
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(500, 10)
    _write_chunk(spark, src, pdf.iloc[:250], "c0")
    _write_chunk(spark, src, pdf.iloc[250:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    def run(factory, out_dir, ckpt_dir):
        stream = factory(
            _read_stream(spark, src),
            size="4 minutes", slide="1 minute", watermark="0 seconds",
        )
        q, sink = write_stream_exactly_once(stream, out_dir, ckpt_dir)
        q.awaitTermination(240)
        got = _got_sink(spark, out_dir)
        return got[got["conv_id"] != "__flush"].reset_index(drop=True)

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got_tws = run(sliding_panes_stream_tws, out + "_t", ckpt + "_t")
        # third leg: TWS + map-side pane pre-combine (swag_pre wire
        # format through the production API) must match byte-for-byte
        got_tws_pre = run(
            lambda df, **kw: sliding_panes_stream_tws(
                df, pre_combine=True, **kw
            ),
            out + "_p", ckpt + "_p",
        )
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got_apply = run(sliding_panes_stream, out + "_a", ckpt + "_a")

    assert len(got_tws) == len(got_apply) > 0
    for c in ("conv_id", "ws", "we", "wagg"):
        assert got_tws[c].tolist() == got_apply[c].tolist()
        assert got_tws_pre[c].tolist() == got_apply[c].tolist()
    # and both equal the offline pane recompute
    exp = _expected_panes(pdf, 4 * SLIDE, SLIDE)
    assert got_tws["wagg"].tolist() == exp["wagg"].tolist()


# --------------------------------------------------------------------------
# Map-side pane pre-combine
# --------------------------------------------------------------------------


def _precombine_pdf(pdf, monoids, val_cols, slide_us=SLIDE, int_flags=None):
    """Build the pre-combined form of a raw batch by hand (single
    upstream partition): one row per pane, ts = max raw ts in the pane,
    blob = pickled [single-row partial per spec] — the wire format
    `_pane_precombine` emits and `_panes_multi_step(pre_col=...)`
    ingests."""
    import pickle

    from sliding_window_aggregators_spark.functions.monoids import p_take
    from sliding_window_aggregators_spark.operators.kernels import (
        interval_fold,
    )

    int_flags = int_flags or [False] * len(monoids)
    pdf = pdf.sort_values("ts", kind="mergesort")
    ts = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    pane = ts - ts % slide_us
    newg = np.flatnonzero(np.diff(pane)) + 1
    starts = np.concatenate(([0], newg))
    ends = np.concatenate((newg, [len(pane)]))
    bps = []
    for m, c, int_v in zip(monoids, val_cols, int_flags):
        vals = pdf[c].to_numpy()
        if int_v:
            vals = vals.astype(np.int64)
        bps.append(interval_fold(m, m.lift(vals), starts, ends))
    blobs = [
        pickle.dumps([p_take(bp, [g]) for bp in bps])
        for g in range(len(starts))
    ]
    return pd.DataFrame(
        {
            "ts": np.maximum.reduceat(ts, starts).astype("datetime64[us]"),
            "__pre": blobs,
        }
    )


def test_panes_multi_step_pre_col_matches_raw_path():
    """Kernel-level parity: the same OOO batches ingested raw vs
    pre-combined (partials-per-pane rows) emit identical windows for
    (sum, max) x (2 panes, 4 panes) — including a batch whose panes
    collide with panes already in state (the hit/combine path)."""
    from sliding_window_aggregators_spark.streaming.engine import (
        _panes_multi_step,
    )

    rng = np.random.default_rng(7)
    n = 400
    ts = np.sort(rng.integers(0, 10 * SLIDE, n))
    vals = rng.normal(10.0, 3.0, n).round(3)
    pdf = _mkpdf(ts, vals)
    ms = [get_monoid("sum"), get_monoid("max")]
    sizes = [2 * SLIDE, 4 * SLIDE]

    def drive(batches, pre):
        d = {
            "pane_ts": np.empty(0, np.int64),
            "partials": [m.identity(0) for m in ms],
            "last_emit": -(1 << 62),
            "v": 1,
        }
        got = {}
        wms = [4 * SLIDE, 8 * SLIDE, 20 * SLIDE]
        for b, wm in zip(batches, wms):
            per_size, d = _panes_multi_step(
                d, b, wm, monoids=ms, val_cols=["__v", "__v"], ts_col="ts",
                sizes_us=sizes, slide_us=SLIDE, int_flags=[False, False],
                pre_col="__pre" if pre else None,
            )
            for k_i, em in enumerate(per_size):
                if em is None:
                    continue
                for j, e in enumerate(em["window_end"]):
                    got[(k_i, int(e))] = (
                        em["values"][0][j], em["values"][1][j]
                    )
        return got

    # scramble rows into 3 batches: panes split across batches, and
    # batch 2/3 hit panes already resident in state
    idx = rng.permutation(n)
    chunks = [pdf.iloc[idx[:150]], pdf.iloc[idx[150:260]],
              pdf.iloc[idx[260:]]]
    raw = drive(chunks, pre=False)
    pre = drive(
        [_precombine_pdf(c, ms, ["__v", "__v"]) for c in chunks], pre=True
    )
    assert raw.keys() == pre.keys() and len(raw) > 20
    for k in raw:
        assert raw[k][0] == pytest.approx(pre[k][0], rel=1e-12)
        assert raw[k][1] == pre[k][1]


def test_pane_precombine_rejects_noncommutative(spark):
    from sliding_window_aggregators_spark.streaming import (
        sliding_panes_stream,
    )

    pdf = transcripts_pandas(50, 4)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="commutative"):
        sliding_panes_stream(
            df, monoid_name="argmax", value_expr="cast(turn_idx as double)",
            size="4 minutes", slide="1 minute", pre_combine=True,
        )


def test_sliding_panes_stream_pre_combine_matches_batch(spark, stream_dirs):
    """pre_combine=True (map-side per-(key, pane) partials upstream of
    the stateful shuffle, source repartitioned so one pane arrives as
    SEVERAL partials per batch) == the raw-path pandas pane recompute."""
    from sliding_window_aggregators_spark.streaming import (
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 12)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    stream = sliding_panes_stream(
        _read_stream(spark, src).repartition(4),
        size="4 minutes", slide="1 minute", watermark="0 seconds",
        pre_combine=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(180)

    got = _got_sink(spark, out)
    got = got[got["conv_id"] != "__flush"].reset_index(drop=True)
    exp = _expected_panes(pdf, 4 * SLIDE, SLIDE)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["we"].tolist() == exp["we"].tolist()
    assert got["ws"].tolist() == exp["ws"].tolist()
    assert got["wagg"].tolist() == exp["wagg"].tolist()


def test_sliding_panes_stream_multi_pre_combine_matches_batch(
    spark, stream_dirs
):
    """Shared-pane multi-aggregate rollup with pre_combine=True: ONE
    pickled partial row per (key, pane, upstream partition) carries both
    specs; output == per-size pandas recompute."""
    from sliding_window_aggregators_spark.streaming import (
        sliding_panes_stream_multi,
        write_stream_exactly_once,
    )

    src, out, ckpt = stream_dirs
    pdf = transcripts_pandas(600, 12)
    _write_chunk(spark, src, pdf.iloc[:300], "c0")
    _write_chunk(spark, src, pdf.iloc[300:], "c1")
    flush = pdf.iloc[:1].copy()
    flush["conv_id"] = "__flush"
    flush["ts"] = pdf["ts"].max() + pd.Timedelta(days=2)
    _write_chunk(spark, src, flush, "c2f")

    stream = sliding_panes_stream_multi(
        _read_stream(spark, src).repartition(4),
        monoids=("sum", "max"),
        value_exprs=("length(text)", "cast(turn_idx as double)"),
        sizes=("2 minutes", "4 minutes"),
        slide="1 minute", watermark="0 seconds",
        pre_combine=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(240)

    got = (
        spark.read.parquet(out)
        .selectExpr(
            "conv_id",
            "unix_micros(window_start) as ws",
            "unix_micros(window_end) as we",
            "wsum", "wmax",
        )
        .toPandas()
    )
    got = got[got["conv_id"] != "__flush"]
    for size_us in (2 * SLIDE, 4 * SLIDE):
        gk = (
            got[got["we"] - got["ws"] == size_us]
            .sort_values(["conv_id", "we"])
            .reset_index(drop=True)
        )
        rows = []
        for conv, g in pdf.groupby("conv_id"):
            ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            lens = g["text"].str.len().to_numpy().astype(np.float64)
            idxs = g["turn_idx"].to_numpy().astype(np.float64)
            es = _brute_windows(ts, lens, size_us, SLIDE, fold=sum)
            em = _brute_windows(ts, idxs, size_us, SLIDE, fold=max)
            for e in sorted(es):
                rows.append((conv, e, float(es[e]), float(em[e])))
        exp = pd.DataFrame(rows, columns=["conv_id", "we", "wsum", "wmax"])
        assert gk["conv_id"].tolist() == exp["conv_id"].tolist()
        assert gk["we"].tolist() == exp["we"].tolist()
        assert gk["wsum"].tolist() == exp["wsum"].tolist()
        assert gk["wmax"].tolist() == exp["wmax"].tolist()


# --------------------------------------------------------------------------
# Early firing (Beam-style trigger / Scotty eager emission)
# --------------------------------------------------------------------------

def test_panes_step_early_firing_kernel():
    """early=True: every ingesting batch re-emits provisional values for
    still-open nonempty windows (final=False); watermark closure stays
    the single final (final=True); timeout-only invocations emit finals
    only."""
    MIN = 60 * US
    m = get_monoid("sum")
    d = _panes_empty_state(m)

    def step(pdf, wm):
        return _panes_step(
            d, pdf, wm, monoid=m, ts_col="ts", size_us=SIZE,
            slide_us=SLIDE, int_values=False, early=True,
        )

    # batch 1: rows at minutes 0,1,2 — wm 0, nothing closable
    emitted, d = step(_mkpdf([0, MIN, 2 * MIN], [1, 2, 3]), 0)
    seen = _brute_windows([0, MIN, 2 * MIN], [1, 2, 3])
    assert not emitted["final"].any()
    assert emitted["window_end"].tolist() == sorted(seen)
    assert emitted["values"].tolist() == [seen[e] for e in sorted(seen)]

    # batch 2: row at minute 3, wm minute 2 — ends <= 2min close (final,
    # exact), ends > 2min re-fire provisionally with the updated values
    emitted, d = step(_mkpdf([3 * MIN], [10.0]), 2 * MIN)
    full = _brute_windows([0, MIN, 2 * MIN, 3 * MIN], [1, 2, 3, 10])
    fin = emitted["final"]
    f_ends = emitted["window_end"][fin].tolist()
    p_ends = emitted["window_end"][~fin].tolist()
    assert f_ends == [e for e in sorted(full) if e <= 2 * MIN]
    assert p_ends == [e for e in sorted(full) if e > 2 * MIN]
    assert emitted["values"][fin].tolist() == [full[e] for e in f_ends]
    assert emitted["values"][~fin].tolist() == [full[e] for e in p_ends]

    # timeout-only invocation (no input): finals only, no re-fire
    emitted, d = step(None, 10 * MIN)
    assert emitted["final"].all()
    assert emitted["window_end"].tolist() == [
        e for e in sorted(full) if e > 2 * MIN
    ]
    assert emitted["values"].tolist() == [
        full[e] for e in sorted(full) if e > 2 * MIN
    ]
    assert len(d["pane_ts"]) == 0  # everything evicted after closure


def test_sliding_panes_stream_early_firing(spark, stream_dirs):
    """Streaming early firing through a real update-mode query: the
    memory sink accumulates every fired row, so the provisional
    TRAJECTORY of a window spanning two micro-batches is visible —
    (final=False, partial value) then (final=False, updated value) then
    exactly one (final=True, closure value)."""
    src, out, ckpt = stream_dirs
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(minutes):
        return pd.DataFrame(
            {
                "conv_id": "c1",
                "turn_idx": range(len(minutes)),
                "role": "user",
                "text": ["x" * 10] * len(minutes),
                "tool": "",
                "ts": [base + pd.Timedelta(minutes=mm) for mm in minutes],
            }
        )

    _write_chunk(spark, src, rows([0, 1, 2]), "b0")
    _write_chunk(spark, src, rows([3]), "b1")
    _write_chunk(spark, src, rows([60]), "b2")
    _write_chunk(spark, src, rows([120]), "b3")

    stream = sliding_panes_stream(
        _read_stream(spark, src),
        size="4 minutes", slide="1 minute", watermark="0 seconds",
        early=True,
    )
    q = (
        stream.writeStream.format("memory").queryName("early_tbl")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("early_tbl")
        .selectExpr(
            "unix_micros(window_end) as we", "wagg", "final"
        )
        .toPandas()
    )
    MIN = 60 * US
    t0 = base.value // 1000

    # exactly one final per closed window; values exact vs the brute
    fin = got[got["final"]]
    assert fin["we"].is_unique
    full = _brute_windows(
        [0, MIN, 2 * MIN, 3 * MIN, 60 * MIN, 120 * MIN],
        [10.0] * 6,
    )
    closed = sorted(fin["we"] - t0)
    for e in closed:
        assert fin.loc[fin["we"] == t0 + e, "wagg"].iloc[0] == full[e]
    # every window that CAN have closed (ends <= the last batch's wm of
    # minute 60) did close exactly once
    assert set(closed) >= {e for e in full if e <= 60 * MIN}

    # the cross-batch window [0, 4min): provisional 30 after batch 1
    # (rows 0,1,2), provisional 40 after batch 2 (row 3 arrives),
    # exactly one final 40
    w4 = got[got["we"] == t0 + 4 * MIN]
    traj = sorted(zip(w4["final"], w4["wagg"]))
    assert (False, 30.0) in traj and (False, 40.0) in traj
    assert traj.count((True, 40.0)) == 1
    assert (True, 30.0) not in traj

    # windows no watermark could close (ends past the last event) are
    # provisional-only
    open_ends = {t0 + (120 + k) * MIN for k in range(1, 5)}
    assert not fin["we"].isin(open_ends).any()
    assert got[~got["final"]]["we"].isin(open_ends).any()


@pytest.mark.skipif(
    os.environ.get("SWAG_SKIP_TWS") == "1",
    reason="explicitly skipped via SWAG_SKIP_TWS",
)
def test_sliding_panes_stream_tws_early_firing(spark, stream_dirs):
    """Early firing under the PRODUCTION arbitrary-state API: same
    trajectory contract as the apply path — provisional re-fires on
    ingesting batches, exactly one final per closed window, timer
    expiries emit finals only — through transformWithStateInPandas +
    RocksDB in Update output mode."""
    from sliding_window_aggregators_spark.compat import protobuf_available

    if not protobuf_available():
        pytest.skip("no google.protobuf and the vendored runtime failed")
    from sliding_window_aggregators_spark.streaming import (
        sliding_panes_stream_tws,
    )

    src, out, ckpt = stream_dirs
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(minutes):
        return pd.DataFrame(
            {
                "conv_id": "c1",
                "turn_idx": range(len(minutes)),
                "role": "user",
                "text": ["x" * 10] * len(minutes),
                "tool": "",
                "ts": [base + pd.Timedelta(minutes=mm) for mm in minutes],
            }
        )

    _write_chunk(spark, src, rows([0, 1, 2]), "b0")
    _write_chunk(spark, src, rows([3]), "b1")
    _write_chunk(spark, src, rows([60]), "b2")

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = sliding_panes_stream_tws(
            _read_stream(spark, src),
            size="4 minutes", slide="1 minute", watermark="0 seconds",
            early=True,
        )
        q = (
            stream.writeStream.format("memory").queryName("tws_early_tbl")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = (
        spark.table("tws_early_tbl")
        .selectExpr("unix_micros(window_end) as we", "wagg", "final")
        .toPandas()
    )
    MIN = 60 * US
    t0 = base.value // 1000

    fin = got[got["final"]]
    assert fin["we"].is_unique
    full = _brute_windows(
        [0, MIN, 2 * MIN, 3 * MIN, 60 * MIN], [10.0] * 5
    )
    for e in fin["we"] - t0:
        assert fin.loc[fin["we"] == t0 + e, "wagg"].iloc[0] == full[e]
    # the cross-batch window [0, 4min): provisional 30, provisional 40,
    # exactly one final 40
    w4 = got[got["we"] == t0 + 4 * MIN]
    traj = list(zip(w4["final"], w4["wagg"]))
    assert (False, 30.0) in traj and (False, 40.0) in traj
    assert traj.count((True, 40.0)) == 1 and (True, 30.0) not in traj


# --------------------------------------------------------------------------
# Property fuzz: the pane kernel under arbitrary batch splits + disorder
# --------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_panes_step_fuzz_arbitrary_splits_vs_brute(data):
    """For random rows dealt into random micro-batches in random order
    (full OOO — the watermark is held at 0 so nothing is late), the
    final flush must yield EXACTLY the brute emitted set, each window
    exactly once, for a sum (commutative group), a max (idempotent),
    and a toolset (bitset) fold."""
    n = data.draw(st.integers(1, 50))
    ts = data.draw(st.lists(
        st.integers(0, 10 * SLIDE - 1), min_size=n, max_size=n
    ))
    vals = data.draw(st.lists(
        st.integers(0, 9), min_size=n, max_size=n
    ))
    n_b = data.draw(st.integers(1, 4))
    assign = data.draw(st.lists(
        st.integers(0, n_b - 1), min_size=n, max_size=n
    ))
    size_us = data.draw(st.integers(1, 5)) * SLIDE
    name, int_v, fold = data.draw(st.sampled_from([
        ("sum", False, sum),
        ("max", False, max),
        ("toolset", True,
         lambda vs: float(len({int(v) % 63 for v in vs}))),
    ]))
    m = get_monoid(name, np.int64 if int_v else np.float64)
    d = _panes_empty_state(m)
    got = {}

    def run(pdf, wm):
        nonlocal d
        emitted, d = _panes_step(
            d, pdf, wm, monoid=m, ts_col="ts", size_us=size_us,
            slide_us=SLIDE, int_values=int_v,
        )
        if emitted is not None:
            for e, v in zip(emitted["window_end"], emitted["values"]):
                assert int(e) not in got  # exactly once
                got[int(e)] = float(v)

    for b in range(n_b):
        sel = [i for i in range(n) if assign[i] == b]
        if sel:
            run(_mkpdf([ts[i] for i in sel], [vals[i] for i in sel]), 0)
    run(None, 20 * SLIDE + size_us)  # flush: closes every window

    exp = _brute_windows(ts, vals, size_us, SLIDE, fold=fold)
    assert got == {e: float(v) for e, v in exp.items()}
    assert len(d["pane_ts"]) == 0  # fully evicted after the flush
