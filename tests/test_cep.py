"""CEP pattern matching as sliding-window aggregation (DfaTransform:
transition-composition monoids — parallel prefix automata). Covers the
automaton constructors against plain-Python replays, the monoid's 2-D
scans, the fused batch query vs its DuckDB value-hash oracle, planted
patterns, and the streaming count-window form (tool-loop detection over
transcripts) vs a brute DFA replay across a micro-batch boundary."""

import os

import numpy as np
import pandas as pd
import pytest

from sliding_window_aggregators_spark.functions import (
    DfaTransform,
    dfa_contains,
    dfa_run,
    get_monoid,
)

SF_DIR = os.environ.get("SWAG_TEST_SF_DIR", "/root/testdata/sf0.001")
RNG = np.random.default_rng(20260818)


@pytest.fixture
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")


def _replay(dfa, syms):
    st = dfa.q0
    outs = []
    for s in syms:
        st = int(dfa.delta[st, int(s) % dfa.alphabet])
        outs.append(st)
    return outs


def test_dfa_contains_matches_python_substring():
    pat = [0, 2, 1, 2]
    m = DfaTransform(dfa_contains(pat, 4))
    pstr = "".join(map(str, pat))
    for _ in range(50):
        syms = RNG.integers(0, 4, RNG.integers(1, 40))
        states = m.lower(m.accumulate(m.lift(syms)))
        s = "".join(map(str, syms.tolist()))
        for i, st in enumerate(states.tolist()):
            assert (st == 4) == (pstr in s[: i + 1]), (s, i)


def test_dfa_run_matches_python_trailing_run():
    m = DfaTransform(dfa_run(1, 3, 3))
    for _ in range(50):
        syms = RNG.integers(0, 3, RNG.integers(1, 40)).tolist()
        states = m.lower(m.accumulate(m.lift(np.array(syms))))
        seen, run = False, 0
        for i, s in enumerate(syms):
            run = run + 1 if s == 1 else 0
            seen = seen or run >= 3
            assert (states[i] == 3) == seen


def test_dfa_windowed_matches_per_window_replay():
    """Sliding w=8: kernel answer per row == replay of just that window
    (the monoid answers 'does THIS window match', not 'has it ever')."""
    from sliding_window_aggregators_spark.operators.kernels import sliding_reduce

    m = get_monoid("dfa")
    syms = RNG.integers(0, 5, 500).astype(float)
    got = sliding_reduce(m, syms, 8)
    for i in range(len(syms)):
        w = syms[max(0, i - 7) : i + 1]
        assert got[i] == _replay(m.dfa, w)[-1]


def test_packed_and_vector_representations_agree():
    """The packed (transition-monoid code) and vector (state-map array)
    representations must produce identical lowered answers through lift/
    combine/scans — forced by capping the enumeration to 0 elements."""

    class VectorOnly(DfaTransform):
        _PACK_CAP = 0

    for dfa in [dfa_run(2, 3, 5), dfa_contains([4, 0, 3], 5),
                dfa_contains([1, 0, 1, 1], 3)]:
        mp, mv = DfaTransform(dfa), VectorOnly(dfa)
        assert mp._packed and not mv._packed
        syms = RNG.integers(0, 9, 300)
        pp, pv = mp.lift(syms), mv.lift(syms)
        assert mp.lower(mp.accumulate(pp)).tolist() == \
            mv.lower(mv.accumulate(pv)).tolist()
        assert mp.lower(mp.raccumulate(pp)).tolist() == \
            mv.lower(mv.raccumulate(pv)).tolist()
        assert mp.lower(mp.reduce(pp)).tolist() == mv.lower(mv.reduce(pv)).tolist()
        # pairwise combines of arbitrary products
        ap = mp.combine(mp.reduce(pp), pp)
        av = mv.combine(mv.reduce(pv), pv)
        assert mp.lower(ap).tolist() == mv.lower(av).tolist()


def test_vector_fallback_through_kernels():
    """A capped (vector-path) instance must still pass the kernel
    strategies — the fallback is a real code path, not dead weight."""
    from sliding_window_aggregators_spark.operators.kernels import (
        SlidingCountWindow,
        sliding_reduce,
    )

    class VectorOnly(DfaTransform):
        _PACK_CAP = 0

    m = VectorOnly(dfa_run(1, 3, 4))
    data = RNG.integers(0, 4, 800).astype(float)
    for w in [4, 33, 100]:
        exp = [
            m.lower1(m.lift_reduce(data[max(0, i - w + 1) : i + 1]))
            for i in range(len(data))
        ]
        assert sliding_reduce(m, data, w).tolist() == exp
        k = SlidingCountWindow(m, w, strategy="twostacks")
        assert k.process(data).tolist() == exp


def test_dfa_2d_scans_match_rowwise():
    class VectorOnly(DfaTransform):
        _PACK_CAP = 0

    for m in [get_monoid("dfa"), get_monoid("dfa_funnel"),
              VectorOnly(dfa_run(2, 3, 5))]:
        (k,) = m.lift(RNG.integers(0, 5, 4)).keys()
        p = m.lift(RNG.integers(0, 5, 64))
        p2 = {k: p[k].reshape((8, 8) + p[k].shape[1:])}
        a2, r2 = m.accumulate(p2, axis=1), m.raccumulate(p2, axis=1)
        for row in range(8):
            p1 = {k: p2[k][row]}
            assert np.array_equal(a2[k][row], m.accumulate(p1)[k])
            assert np.array_equal(r2[k][row], m.raccumulate(p1)[k])


def test_cep_pattern_vs_duckdb_value_hash(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.check_oracles import compare, duck_con

    from sliding_window_aggregators_spark.plans.events_queries import (
        ORACLE_CEP_PATTERN,
        q_cep_pattern,
    )

    con = duck_con(SF_DIR)
    assert compare("cep_pattern", q_cep_pattern(spark, SF_DIR), con, ORACLE_CEP_PATTERN)


def test_cep_pattern_planted(spark, tmp_path):
    """Planted sequences: an error burst inside the 8-window flags exactly
    from its 3rd consecutive error until it leaves the window; the funnel
    flags from the purchase that completes signup→click→purchase."""
    from sliding_window_aggregators_spark.plans.events_queries import q_cep_pattern

    types = (
        ["view", "error", "error", "error", "view", "view", "view", "view",
         "view", "view", "view", "view"]  # errors at idx 1-3
        + ["signup", "click", "purchase", "view"]  # funnel at idx 14
    )
    pdf = pd.DataFrame(
        {
            "event_id": range(len(types)),
            "ts": pd.date_range("2024-01-01", periods=len(types), freq="1min"),
            "user_id": 7,
            "event_type": types,
            "value": 1.0,
            "props": "{}",
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = (
        q_cep_pattern(spark, str(tmp_path))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # burst completes at idx 3; idx 8 is the last row whose trailing-8
    # window [1..8] still contains all three errors
    assert got["err_burst"].tolist() == [
        1 if 3 <= i <= 8 else 0 for i in range(len(types))
    ]
    # funnel completes at idx 14 and stays in the 16-window to the end
    assert got["funnel_hit"].tolist() == [1 if i >= 14 else 0 for i in range(len(types))]


def test_cep_fused_with_sum_in_multi_stream(spark, stream_dirs):
    """Numeric aggregation + CEP pattern matching in ONE window-shared
    stateful operator: sliding_agg_stream_multi with monoids (sum, dfa)
    over distinct lifted inputs — rolling text length and the tool-loop
    automaton state over the same event-time window, one Exchange, one
    state roundtrip. The dfa member answers from the ordered timestamp
    spine, i.e. pattern state is evaluated in EVENT-TIME order."""
    from test_streaming import _read_stream, _write_chunk

    from sliding_window_aggregators_spark.sources import transcripts_pandas
    from sliding_window_aggregators_spark.streaming import (
        sliding_agg_stream_multi,
        write_stream_exactly_once,
    )

    pdf = transcripts_pandas(500, 15).reset_index(drop=True)
    conv = pdf["conv_id"].iloc[0]
    pdf.loc[pdf.index[pdf["conv_id"] == conv][:5], "role"] = "tool"
    src, out, ckpt = stream_dirs
    _write_chunk(spark, src, pdf.iloc[:250], "c0")
    _write_chunk(spark, src, pdf.iloc[250:], "c1")

    sym_expr = (
        "case role when 'user' then 0 when 'assistant' then 1 "
        "when 'tool' then 2 else 3 end"
    )
    stream = sliding_agg_stream_multi(
        _read_stream(spark, src),
        monoids=("sum", "dfa"),
        durations=("3 minutes",),
        value_exprs=("length(text)", sym_expr),
        int_values=True,
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)
    phys = q._jsq.explainInternal(False)
    assert phys.count("Exchange") == 1, phys

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wsum_0", "wdfa_0")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    m = get_monoid("dfa")
    sym_map = {"user": 0, "assistant": 1, "tool": 2}
    dur = 180_000_000
    exp_rows = []
    for conv_id, g in pdf.groupby("conv_id"):
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lens = g["text"].str.len().to_numpy()
        syms = np.array([sym_map.get(r, 3) for r in g["role"]])
        for i in range(len(g)):
            mask = ts[: i + 1] >= ts[i] - dur
            exp_rows.append(
                (
                    conv_id,
                    g["ts"].iloc[i],
                    int(lens[: i + 1][mask].sum()),
                    _replay(m.dfa, syms[: i + 1][mask])[-1],
                )
            )
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wsum_0", "wdfa_0"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wsum_0"].astype(int).tolist() == exp["wsum_0"].tolist()
    assert got["wdfa_0"].astype(int).tolist() == exp["wdfa_0"].tolist()
    assert (got["wdfa_0"] == 3).any()  # the planted loop was detected


def test_cep_stream_tool_loop_matches_brute(spark, stream_dirs):
    """Streaming CEP: ≥3 consecutive tool turns within the last 8 turns of
    a conversation, via sliding_count_stream + the dfa monoid; must equal
    a brute per-window DFA replay, including across the micro-batch
    boundary (kernel state carries the open window)."""
    from test_streaming import _read_stream, _write_chunk

    from sliding_window_aggregators_spark.functions import get_monoid
    from sliding_window_aggregators_spark.sources import transcripts_pandas
    from sliding_window_aggregators_spark.streaming import (
        sliding_count_stream,
        write_stream_exactly_once,
    )

    pdf = transcripts_pandas(400, 12).reset_index(drop=True)
    # plant a tool loop spanning the chunk boundary of one conversation
    conv = pdf["conv_id"].iloc[0]
    idx = pdf.index[pdf["conv_id"] == conv][:6]
    pdf.loc[idx, "role"] = "tool"
    src, out, ckpt = stream_dirs
    _write_chunk(spark, src, pdf.iloc[:200], "c0")
    _write_chunk(spark, src, pdf.iloc[200:], "c1")

    sym_expr = (
        "cast(case role when 'user' then 0 when 'assistant' then 1 "
        "when 'tool' then 2 else 3 end as double)"
    )
    stream = sliding_count_stream(
        _read_stream(spark, src),
        monoid_name="dfa",
        value_expr=sym_expr,
        w=8,
        out_col="wstate",
    )
    q, sink = write_stream_exactly_once(stream, out, ckpt)
    q.awaitTermination(120)

    got = (
        sink.read_committed(spark)
        .select("conv_id", "ts", "wstate")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    m = get_monoid("dfa")
    sym_map = {"user": 0, "assistant": 1, "tool": 2}
    exp_rows = []
    for conv_id, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        syms = [sym_map.get(r, 3) for r in g["role"]]
        for i in range(len(g)):
            w = syms[max(0, i - 7) : i + 1]
            exp_rows.append((conv_id, g["ts"].iloc[i], _replay(m.dfa, w)[-1]))
    exp = (
        pd.DataFrame(exp_rows, columns=["conv_id", "ts", "wstate"])
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["wstate"].tolist() == exp["wstate"].tolist()
    assert (got["wstate"] == 3).any()  # the planted loop was detected
