"""Second-wave pipeline operators: pure-Python / planted-row oracles for
the packing kernel, the HLL sketch spec, and the PII scan, plus
invariant checks on the driver queries at sf0.001."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sliding_window_aggregators_spark.plans.pipeline_queries import (
    _PACK_BUDGET,
    _PACK_SHARDS,
    _SAMPLE_K,
    _greedy_pack,
    pii_scan_df,
    repetition_ratio_df,
)

SF_DIR = os.environ.get("SWAG_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# greedy packing: kernel vs the sequential recurrence (the oracle's spec)
# ---------------------------------------------------------------------------


def pack_sequential(tok, budget):
    """The recursive-CTE recurrence, literally: acc resets when adding
    the next document would exceed the budget."""
    out, acc, pack = [], None, 0
    for t in tok:
        if acc is None:
            acc = t
        elif acc + t > budget:
            acc, pack = t, pack + 1
        else:
            acc += t
        out.append(pack)
    return out


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=400),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_greedy_pack_matches_sequential_recurrence(tok, budget):
    got = _greedy_pack(np.array(tok, dtype=np.int64), budget).tolist()
    assert got == pack_sequential(tok, budget)


def test_greedy_pack_overbudget_doc_gets_own_pack():
    # 300 > budget: doc 0 alone in pack 0, doc 1 starts pack 1
    assert _greedy_pack(np.array([300, 10, 10]), 100).tolist() == [0, 1, 1]
    # over-budget doc in the middle closes the previous pack
    assert _greedy_pack(np.array([10, 300, 10]), 100).tolist() == [0, 1, 2]


def test_pack_sequences_budget_invariant(spark):
    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        q_pack_sequences,
    )

    pdf = q_pack_sequences(spark, SF_DIR).toPandas()
    assert len(pdf) == 500
    for (_, _), grp in pdf.groupby(["shard", "pack_id"]):
        total = grp["n_tok"].sum()
        assert total <= _PACK_BUDGET or len(grp) == 1
    # packs are contiguous in doc order within each shard
    for _, grp in pdf.groupby("shard"):
        packs = grp.sort_values("doc_id")["pack_id"].to_numpy()
        assert (np.diff(packs) >= 0).all()
        assert (np.diff(packs) <= 1).all()


# ---------------------------------------------------------------------------
# HLL: first-principles Python oracle of the exact spec
# ---------------------------------------------------------------------------


from conftest import hll_reference as hll_py  # one spec oracle for all HLL forms


def test_hll_query_matches_python_oracle(spark):
    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        q_hll_users_by_type,
    )

    got = {
        r["event_type"]: (r["n_exact"], r["hll_est"])
        for r in q_hll_users_by_type(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for row in ev.select("event_type").distinct().collect():
        et = row["event_type"]
        users = [
            r["user_id"]
            for r in ev.where(ev.event_type == et).select("user_id").distinct().collect()
        ]
        assert got[et][0] == len(users)
        assert got[et][1] == hll_py(users)


def test_hll_estimate_accuracy_large_n():
    # 64 registers → ~13% standard error; 20k distinct values
    est = hll_py(range(20_000))
    assert abs(est - 20_000) / 20_000 < 0.30


# ---------------------------------------------------------------------------
# PII scan: planted rows (the synthetic corpus has no PII by design)
# ---------------------------------------------------------------------------


def test_pii_scan_planted_rows(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk or call 555-123-4567"),
        (2, "see https://example.com/path?q=1 and http://b.io twice"),
        (3, "plain text with wonderful elongated vocabulary"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scan_df(df).collect()}
    assert got[1]["n_emails"] == 1
    assert got[1]["n_phones"] == 1
    assert got[1]["redacted_len"] == len(
        "contact me at <EMAIL> or call <PHONE>"
    )
    assert got[2]["n_urls"] == 2
    assert got[3]["n_emails"] == got[3]["n_urls"] == got[3]["n_phones"] == 0
    assert got[3]["n_long_words"] == 3  # wonderful elongated vocabulary
    assert got[4]["redacted_len"] == 0


# ---------------------------------------------------------------------------
# repetition ratio: planted documents with known top grams
# ---------------------------------------------------------------------------


def test_repetition_ratio_planted(spark):
    rows = [
        (1, "a b c a b c a b c"),  # "a b c" 3×; 7 grams total
        (2, "x y"),  # under 3 tokens → no grams
        (3, "p q r s"),  # 2 grams, all unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_ratio_df(df).collect()}
    assert got[1]["n_grams"] == 7
    assert got[1]["max_rep"] == 3
    assert got[1]["top_gram"] == "a b c"
    assert got[1]["rep_ppm"] == (3 * 1_000_000) // 7
    assert got[2]["n_grams"] == 0 and got[2]["rep_ppm"] == 0
    assert got[3]["max_rep"] == 1 and got[3]["top_gram"] == "p q r"


# ---------------------------------------------------------------------------
# stratified sample / tf-idf invariants at sf0.001
# ---------------------------------------------------------------------------


def test_stratified_sample_k_per_stratum(spark):
    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        q_stratified_sample,
    )

    pdf = q_stratified_sample(spark, SF_DIR).toPandas()
    per = pdf.groupby("lang")["sample_rank"].agg(["count", "min", "max"])
    assert (per["count"] <= _SAMPLE_K).all()
    assert (per["min"] == 1).all()
    # deterministic across runs
    pdf2 = q_stratified_sample(spark, SF_DIR).toPandas()
    assert sorted(pdf["doc_id"]) == sorted(pdf2["doc_id"])


def test_tfidf_top_terms_rank_and_tiebreak(spark):
    rows = [
        (1, "zebra zebra common"),
        (2, "apple common common"),
        (3, "common plain words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # inline the query logic over a planted frame via a temp parquet-free path
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tf = (
        df.withColumn("tok", F.explode(F.split("text", " ")))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfc, "tok").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    top = (
        scored.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .collect()
    )
    best = {r["doc_id"]: r["tok"] for r in top}
    # doc 1: zebra tf=2 df=1 → 2.0 beats common (1/3)
    assert best[1] == "zebra"
    # doc 2: common tf=2 df=3 (0.67) vs apple tf=1 df=1 (1.0) → apple
    assert best[2] == "apple"


@pytest.mark.parametrize(
    "name",
    [
        "hll_users_by_type",
        "pack_sequences",
        "stratified_sample",
        "repetition_ratio",
        "tfidf_top_terms",
        "pii_scan",
        "decontaminate",
    ],
)
def test_pipeline_queries_vs_duckdb(spark, name):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from tools.check_oracles import compare, duck_con

    con = duck_con(SF_DIR)
    sdf = entry.queries()[name](spark, SF_DIR)
    assert compare(name, sdf, con, entry.oracle_sql()[name])


# ---------------------------------------------------------------------------
# bigram LM corpus-fit score (not in the 50-slot driver registry — the
# identical value-hash oracle comparison runs here instead)
# ---------------------------------------------------------------------------


def test_lm_fit_vs_duckdb_value_hash(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.check_oracles import compare, duck_con

    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        ORACLE_LM_FIT,
        q_lm_fit,
    )

    con = duck_con(SF_DIR)
    assert compare("lm_fit", q_lm_fit(spark, SF_DIR), con, ORACLE_LM_FIT)


def test_lm_fit_planted_gibberish_scores_low(spark, tmp_path):
    from sliding_window_aggregators_spark.plans.pipeline_queries import q_lm_fit

    # 8 corpus-typical docs repeating the same phrases vs one gibberish
    # doc of unique never-repeated tokens: every gibberish bigram has
    # cbg=1 while typical-phrase bigrams have cbg≈8, so the pooled
    # smoothed likelihood must rank gibberish strictly lowest
    typical = "the cat sat on the mat and the dog ran to the cat"
    rows = [(i, typical) for i in range(1, 9)]
    rows.append((9, "qz wv xj kp bn md lt rs gh fy"))
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {r["doc_id"]: r.asDict() for r in q_lm_fit(spark, sf_dir).collect()}
    assert got[9]["lm_fit_ppm"] < min(got[i]["lm_fit_ppm"] for i in range(1, 9))
    # tiny corpus: everything is inside the top-1024 vocab
    assert all(v["n_oov"] == 0 for v in got.values())
    # n_bigrams = tokens - 1 for every doc
    assert got[1]["n_bigrams"] == len(typical.split(" ")) - 1
    assert got[9]["n_bigrams"] == 9
    # gibberish bigrams are all unique: sum_cbg == n_bigrams exactly
    assert got[9]["sum_cbg"] == got[9]["n_bigrams"]


def test_doc_chunks_vs_duckdb_value_hash(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.check_oracles import compare, duck_con

    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        ORACLE_DOC_CHUNKS,
        q_doc_chunks,
    )

    con = duck_con(SF_DIR)
    assert compare("doc_chunks", q_doc_chunks(spark, SF_DIR), con, ORACLE_DOC_CHUNKS)


def test_doc_chunks_structure_planted(spark, tmp_path):
    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        _CHUNK_C,
        _CHUNK_O,
        _CHUNK_S,
        q_doc_chunks,
    )

    # 150 tokens, C=64 / S=48: chunks [0,64) [48,112) [96,150); the k=3
    # tail [144,150) is pure overlap (subset of chunk 2) and must be
    # dropped by the n_new > 0 own-token rule — the chunk-halo
    # own-row-accounting analogue
    n = 150
    text = " ".join(f"t{i}" for i in range(n))
    rows = [
        (1, text),
        (2, " ".join(f"s{i}" for i in range(10))),
        # empty text: split('') is [''] in BOTH Spark and DuckDB — one
        # chunk of one empty token, md5('') chunk hash
        (3, ""),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = q_doc_chunks(spark, sf_dir).collect()
    d1 = sorted(
        (r.asDict() for r in got if r["doc_id"] == 1),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]
    assert [(r["start_i"], r["end_i"]) for r in d1] == [
        (0, 63),
        (48, 111),
        (96, 149),
    ]
    assert [r["n_tok"] for r in d1] == [64, 64, 54]
    # every token appears once per covering chunk: total = n + O * (chunks-1)
    assert sum(r["n_tok"] for r in d1) == n + _CHUNK_O * (len(d1) - 1)
    # the chunk grid is the configured one
    assert all(r["start_i"] == r["chunk_id"] * _CHUNK_S for r in d1)
    assert all(
        r["end_i"] - r["start_i"] + 1 <= _CHUNK_C for r in d1
    )
    # short doc: exactly one chunk holding all tokens
    d2 = [r.asDict() for r in got if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["n_tok"] == 10 and d2[0]["n_new"] == 10
    # deterministic split is a pure function of doc_id
    assert {r["split"] for r in got if r["doc_id"] == 1}.issubset(
        {"train", "val", "test"}
    )
    assert len({r["split"] for r in got if r["doc_id"] == 1}) == 1
    # empty text: exactly one chunk of one empty token, md5('') hash
    d3 = [r.asDict() for r in got if r["doc_id"] == 3]
    assert len(d3) == 1 and d3[0]["n_tok"] == 1
    assert d3[0]["chunk_hash"] == "d41d8cd98f00b204e9800998ecf8427e"


@given(st.integers(min_value=1, max_value=2000))
@settings(max_examples=200, deadline=None)
def test_doc_chunks_grid_properties(n):
    # pure-python twin of the SQL chunk-grid arithmetic: for every doc
    # length n, (a) every token lands in >= 1 kept chunk, (b) no token
    # is replicated more than ceil(C/S) = 2 times, (c) kept chunks are
    # exactly those starting on the stride grid with at least one
    # own (non-overlap) token, (d) coverage row count = n + O * (kept-1)
    # whenever every kept chunk is full-stride-covered
    from sliding_window_aggregators_spark.plans.pipeline_queries import (
        _CHUNK_C,
        _CHUNK_O,
        _CHUNK_S,
    )

    C, O, S = _CHUNK_C, _CHUNK_O, _CHUNK_S
    member = {}
    for i in range(n):
        k_lo = max(0, (i - O) // S)
        k_hi = i // S
        for k in range(k_lo, k_hi + 1):
            member.setdefault(k, []).append(i)
    kept = {
        k: v
        for k, v in member.items()
        if k == 0 or any(i >= k * S + O for i in v)
    }
    # (c) kept == stride-grid chunks owning at least one new token
    expect = {0} | {k for k in member if k > 0 and n > k * S + O}
    assert set(kept) == expect
    # (a) full coverage by kept chunks
    covered = sorted({i for v in kept.values() for i in v})
    assert covered == list(range(n))
    # (b) bounded replication
    from collections import Counter

    reps = Counter(i for v in kept.values() for i in v)
    assert max(reps.values()) <= -(-C // S)
    # each kept chunk matches the SQL aggregate's start/size bounds
    for k, v in kept.items():
        assert min(v) == k * S
        assert max(v) - min(v) + 1 <= C
    # (d) total emitted rows = n + O per extra kept chunk
    assert sum(len(v) for v in kept.values()) == n + O * (len(kept) - 1)
