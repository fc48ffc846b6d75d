"""DecayedSum — exponential half-life decay over event time as a
timestamped monoid. Exactness discipline: integer values × power-of-2
decay = dyadic rationals, so every comparison below is EXACT equality
(tolist() ==), including the DuckDB value-hash oracle: no rounding,
no tolerance."""

import os

import numpy as np
import pandas as pd
import pytest

from sliding_window_aggregators_spark.functions import (
    DecayedSum,
    get_monoid,
    p_concat,
    p_take,
)

SF_DIR = os.environ.get("SWAG_TEST_SF_DIR", "/root/testdata/sf0.001")
RNG = np.random.default_rng(20260818)
SH = 40


def _pack(t, v):
    return (np.asarray(t, dtype=np.int64) << SH) | np.asarray(v, dtype=np.int64)


def _brute_prefix(m, p, n):
    outs, acc = [], None
    for i in range(n):
        pi = p_take(p, slice(i, i + 1))
        acc = pi if acc is None else m.combine(acc, pi)
        outs.append(acc)
    return p_concat(*outs)


def _brute_suffix(m, p, n):
    outs, acc = [], None
    for i in reversed(range(n)):
        pi = p_take(p, slice(i, i + 1))
        acc = pi if acc is None else m.combine(pi, acc)
        outs.append(acc)
    return p_concat(*outs[::-1])


def test_scans_match_brute_fold_bit_exact():
    m = get_monoid("decayed")
    for _ in range(20):
        n = int(RNG.integers(1, 150))
        p = m.lift(_pack(RNG.integers(0, 25, n), RNG.integers(0, 1 << 20, n)))
        a, ea = m.accumulate(p), _brute_prefix(m, p, n)
        r, er = m.raccumulate(p), _brute_suffix(m, p, n)
        for k in ("s", "t"):
            assert a[k].tolist() == ea[k].tolist()
            assert r[k].tolist() == er[k].tolist()


def test_identity_associativity_commutativity():
    m = get_monoid("decayed")
    p = m.lift(_pack(RNG.integers(0, 25, 32), RNG.integers(0, 1 << 20, 32)))
    one = p_take(p, slice(0, 1))
    for k in one:
        assert m.combine(m.identity(1), one)[k].tolist() == one[k].tolist()
        assert m.combine(one, m.identity(1))[k].tolist() == one[k].tolist()
    for _ in range(20):
        x, y, z = (p_take(p, slice(i, i + 1)) for i in RNG.integers(0, 32, 3))
        l = m.combine(m.combine(x, y), z)
        r = m.combine(x, m.combine(y, z))
        c1, c2 = m.combine(x, y), m.combine(y, x)
        for k in ("s", "t"):
            assert l[k].tolist() == r[k].tolist()
            assert c1[k].tolist() == c2[k].tolist()


def test_half_life_semantics():
    m = get_monoid("decayed")
    # 100 at unit 0, 8 at unit 1: one half-life later → 100/2 + 8
    assert m.lower(m.reduce(m.lift(_pack([0, 1], [100, 8])))).tolist() == [58.0]
    # three units of decay: 64 → 8
    assert m.lower(m.reduce(m.lift(_pack([5, 8], [64, 0])))).tolist() == [8.0]


def test_kernel_strategies_bit_exact():
    from sliding_window_aggregators_spark.operators.kernels import (
        SlidingCountWindow,
        sliding_reduce,
    )

    m = get_monoid("decayed")
    n = 2000
    t = np.sort(RNG.integers(0, 28, n)).astype(np.int64)
    data = _pack(t, RNG.integers(0, 1 << 18, n)).astype(float)  # < 2^46: exact
    for w in [1, 4, 33, 100, 519]:
        exp = [
            m.lower1(m.lift_reduce(data[max(0, i - w + 1) : i + 1]))
            for i in range(n)
        ]
        assert sliding_reduce(m, data, w).tolist() == exp
        for strat in ["block", "twostacks"]:
            k = SlidingCountWindow(m, w, strategy=strat)
            got, i = [], 0
            for sz in [700, 1, 299, 500, 500]:
                got.extend(k.process(data[i : i + sz]).tolist())
                i += sz
            assert got == exp, (w, strat)


def test_decayed_revenue_vs_duckdb_value_hash(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.check_oracles import compare, duck_con

    from sliding_window_aggregators_spark.plans.events_queries import (
        ORACLE_DECAYED_REVENUE,
        q_decayed_revenue,
    )

    con = duck_con(SF_DIR)
    assert compare(
        "decayed_revenue", q_decayed_revenue(spark, SF_DIR), con,
        ORACLE_DECAYED_REVENUE,
    )


def test_decayed_stream_matches_brute(spark, tmp_path):
    """Streaming count-window decayed sum over transcripts (packed tu in
    minutes since the corpus epoch), equal to a brute per-window fold
    including across the micro-batch boundary."""
    from test_streaming import _read_stream, _write_chunk

    from sliding_window_aggregators_spark.sources import transcripts_pandas
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

    base_us = int(pd.Timestamp("2024-01-01").value // 1000)
    expr = (
        f"cast((unix_micros(ts) - {base_us}) div 60000000 as bigint) "
        f"* {1 << SH} + length(text)"
    )
    W = 10
    stream = sliding_count_stream(
        _read_stream(spark, str(src)), monoid_name="decayed",
        value_expr=expr, w=W, out_col="dsum",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "dsum")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    m = get_monoid("decayed")
    exp_rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        tu = (
            (g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) - base_us)
            // 60_000_000
        )
        v = g["text"].str.len().to_numpy().astype(np.int64)
        packed = _pack(tu, v)
        for i in range(len(g)):
            win = packed[max(0, i - W + 1) : i + 1]
            exp_rows.append((conv, g["ts"].iloc[i], m.lower1(m.lift_reduce(win))))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "dsum"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["dsum"].tolist() == exp["dsum"].tolist()
