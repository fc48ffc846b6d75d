"""Adversarial-input oracle gate: every SQL-expressible driver query must
hash-match its DuckDB oracle on data the fixtures never contain —
duplicate timestamps (including duplicate (user_id, ts) pairs), exact
zeros, single-event users, empty and one-token documents. This is the
class of input that produced every latent divergence the review pass
found (RANGE-frame ties, ln(0), 0/0 windows, rounding ties); the gate
keeps them closed as queries evolve."""

import os

import numpy as np
import pandas as pd
import pytest

SEED = 20260816


def _adversarial_events(n=4000, n_users=7):
    rng = np.random.default_rng(SEED)
    base = pd.Timestamp("2024-01-01")
    # second-granularity offsets with heavy collision probability, so
    # duplicate ts within AND across users are guaranteed
    offs = np.sort(rng.integers(0, n // 2, n))
    users = rng.integers(0, n_users, n)
    users[:3] = n_users  # a user with exactly 3 events
    values = np.round(rng.gamma(2.0, 50.0, n), 2)
    values[rng.random(n) < 0.02] = 0.0  # exact zeros (the geomean trap)
    values[rng.random(n) < 0.02] = np.round(values[rng.random(n) < 0.02][:0].sum(), 2)
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": base + pd.to_timedelta(offs, unit="s"),
            "user_id": users.astype(np.int64),
            "event_type": np.array(["click", "view", "purchase", "signup", "error"])[
                rng.integers(0, 5, n)
            ],
            "value": values,
            "props": ["{}"] * n,
        }
    )


def _adversarial_documents(n=300):
    rng = np.random.default_rng(SEED + 1)
    vocab = np.array(
        "the a of and to data spark window join table row scan fast slow "
        "agg key value batch line part hash query".split()
    )
    texts = []
    for i in range(n):
        if i == 0:
            texts.append("")  # empty document
        elif i == 1:
            texts.append("solo")  # single token (no 3-grams)
        elif i == 2:
            texts.append("a b")  # two tokens
        elif i % 37 == 0 and i > 3:
            texts.append(texts[i - 1])  # exact duplicate of the previous doc
        else:
            k = int(rng.integers(3, 60))
            texts.append(" ".join(rng.choice(vocab, k)))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "text": texts,
            "lang": np.array(["en", "de", "fr"])[rng.integers(0, 3, n)],
            "source": np.array(["s0", "s1"])[rng.integers(0, 2, n)],
            "n_chars": [len(t) for t in texts],
        }
    )


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    spark.createDataFrame(_adversarial_events()).coalesce(1).write.parquet(
        os.path.join(str(d), "events.parquet")
    )
    spark.createDataFrame(_adversarial_documents()).coalesce(1).write.parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def _duck_con(fuzz_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(
            f"create view {t} as select * from "
            f"read_parquet('{fuzz_dir}/{t}.parquet/*.parquet')"
        )
    return con


# every SQL-expressible query over ONLY the events/documents tables
EVENTS_QUERIES = [
    "sliding_basic_w100", "sliding_argmax_collect_w100",
    "kernel_sum_w100", "kernel_max_w100", "kernel_stats_w100",
    "kernel_argmax_w100", "kernel_bloom_w100", "kernel_sketch_w100",
    "kernel_sum_w16384", "auto_sum_w100", "bucketed_sum_w100",
    "time_range_sum_1h",
    "csv_time_range_sum_1h", "conv_timeout_30m", "ooo_stream_sum_1h",
    "sawtooth_sum_w50", "shared_windows_3x", "shared_hll_3x",
    "tumbling_sum_1h", "session_30m", "asof_join_signup_purchase",
    "cep_three_rising", "cep_funnel_1h", "user_stats", "hll_users_by_type",
    "weekly_retention",
]
DOCS_QUERIES = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash_pairs", "dedup_clusters", "simhash32", "token_stats",
    "quality_score", "lang_id", "doc_fingerprint", "pack_sequences",
    "stratified_sample", "repetition_ratio", "tfidf_top_terms",
    "pii_scan", "decontaminate",
]


@pytest.mark.parametrize("name", EVENTS_QUERIES + DOCS_QUERIES)
def test_query_matches_oracle_on_adversarial_data(spark, fuzz_dir, name):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from tools.check_oracles import compare

    con = _duck_con(fuzz_dir)
    sdf = entry.queries()[name](spark, fuzz_dir)
    assert compare(name, sdf, con, entry.oracle_sql()[name])
    spark.catalog.clearCache()
