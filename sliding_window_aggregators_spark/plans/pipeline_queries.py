"""Second wave of training-data-pipeline operators: a deterministic
HyperLogLog distinct sketch (the approximate-aggregate family the
reference's BloomFilter belongs to — cpp/src/AggregationFunctions.hpp:
325-380 is the membership sketch; this is its cardinality sibling),
token-budget sequence packing, deterministic stratified sampling,
repetition/boilerplate detection, TF-IDF term extraction, and a
regex pattern/PII scan.

Determinism discipline (same as text_queries): every hash is md5-derived
(identical in Spark and DuckDB), all ranking keys are exact integers or
single correctly-rounded IEEE divisions, every float output is produced
by one identical expression in both engines — so each query has a full
value-hash DuckDB oracle.

Scale notes are per-operator; none of these plans contains a cross
product, a driver-side collect, or a per-row Python UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import spread_small_scan


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (deterministic, full value oracle)
# ---------------------------------------------------------------------------

# spec constants shared with the HyperLogLog monoid (functions/monoids.py)
# and the streaming sketch state — one source of truth for the whole family
from ..functions.monoids import (  # noqa: E402
    HLL_ALPHA_M2_SCALED as _HLL_C,
    HLL_M as _HLL_M,
    HLL_P as _HLL_P,
)

# 60-bit hash from the md5 hex prefix — identical in Spark and DuckDB.
# THE one definition of the HLL input hash: every batch/kernel/streaming
# HLL form and every oracle builds its hash through these two helpers.


def spark_md5_60(expr: str) -> str:
    return f"cast(conv(substring(md5(cast(({expr}) as string)), 1, 15), 16, 10) as bigint)"


def duck_md5_60(expr: str) -> str:
    return f"(('0x' || substr(md5(cast(({expr}) as varchar)), 1, 15))::BIGINT)"


_SPARK_H60 = spark_md5_60("user_id")
_DUCK_H60 = duck_md5_60("user_id")


def q_hll_users_by_type(spark, sf_dir):
    """Distinct users per event_type, exact AND via a deterministic
    64-register HyperLogLog: bucket = h % 64, rank = trailing zeros of
    (h >> 6) + 1 (isolate-lowest-bit + bit_count — branch-free in both
    engines), raw estimate = alpha·m² / Σ 2^-M_j with the harmonic sum
    kept as an EXACT integer scaled by 2^55 (max 64·2^55 = 2^61 < int64),
    so the only float op is one final division — bit-identical to the
    DuckDB oracle.

    Scale shape: one distinct on (event_type, user_id) — which also feeds
    the exact count, so sketch and ground truth share the single wide
    shuffle — then two tiny aggregations. At 100 TB the distinct's
    map-side partial aggregation does the heavy lifting; the register
    table is 64 rows per type. (In production the exact branch is what
    you'd drop; it exists here as the sketch's in-query ground truth.)
    """
    # NOT spread: the distinct's map-side partial aggregation reduces the
    # 1M-row scan to ~|distinct pairs| before any exchange — repartitioning
    # first would shuffle the raw rows and was measured 2.3x SLOWER
    pairs = (
        _events(spark, sf_dir)
        .select("event_type", "user_id")
        .distinct()
        .withColumn("h", F.expr(_SPARK_H60))
        .withColumn("b", F.expr(f"h % {_HLL_M}"))
        .withColumn("r", F.expr(f"shiftright(h, {_HLL_P})"))
        .withColumn(
            "rho",
            F.expr("case when r = 0 then 55 else bit_count((r & -r) - 1) + 1 end"),
        )
    )
    regs = pairs.groupBy("event_type", "b").agg(
        F.max("rho").alias("m"), F.count(F.lit(1)).alias("nd")
    )
    per_type = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m)")).alias("s_present"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("nd").alias("n_exact"),
    )
    s_total = F.col("s_present") + F.expr(f"shiftleft(cast({_HLL_M} - nb as bigint), 55)")
    est = F.round(F.lit(_HLL_C) / s_total.cast("double"), 4)
    return per_type.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        est.alias("hll_est"),
    )


ORACLE_HLL_USERS_BY_TYPE = f"""
with pairs as (
  select distinct event_type, user_id from events
),
hashed as (
  select event_type, {_DUCK_H60} as h from pairs
),
rho as (
  select event_type, h % {_HLL_M} as b,
         case when (h >> {_HLL_P}) = 0 then 55
              else bit_count(((h >> {_HLL_P}) & -(h >> {_HLL_P})) - 1) + 1 end as rho
  from hashed
),
regs as (
  select event_type, b, max(rho) as m, count(*) as nd
  from rho group by 1, 2
),
per_type as (
  select event_type,
         sum((1::BIGINT << (55 - m)))::BIGINT as s_present,
         count(*) as nb, sum(nd) as n_exact
  from regs group by event_type
)
select event_type, cast(n_exact as bigint) as n_exact,
       round({_HLL_C!r} / cast(s_present + (({_HLL_M} - nb)::BIGINT << 55) as double), 4)
         as hll_est
from per_type
"""


# ---------------------------------------------------------------------------
# sequence packing (token-budget greedy first-fit, contiguous per shard)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 128  # whitespace tokens per pack
_PACK_SHARDS = 8  # parallelism unit; production would use ~4× cores


def _greedy_pack(tok: np.ndarray, budget: int) -> np.ndarray:
    """Greedy contiguous packing: each pack takes documents in order while
    the running token total stays ≤ budget (always at least one document).
    Vectorized per PACK, not per row: pack boundaries come from
    searchsorted on the token cumsum, so the Python loop runs once per
    emitted pack."""
    n = len(tok)
    out = np.empty(n, dtype=np.int64)
    cum = np.cumsum(tok.astype(np.int64))
    i, base, pack = 0, 0, 0
    while i < n:
        j = int(np.searchsorted(cum, base + budget, side="right"))
        if j <= i:
            j = i + 1  # single document over budget gets its own pack
        out[i:j] = pack
        base = int(cum[j - 1])
        pack += 1
        i = j
    return out


def q_pack_sequences(spark, sf_dir):
    """Training-batch sequence packing: shard the corpus (doc_id %
    {shards}), order each shard by doc_id, and greedily pack consecutive
    documents into token-budget-{budget} packs (a pack closes when adding
    the next document would exceed the budget). Output: (doc_id, shard,
    pack_id, n_tok).

    Scale shape: packing is sequential BY DEFINITION within a shard and
    embarrassingly parallel across shards — the shard count is the
    parallelism knob (thousands at 100 TB). One shuffle to co-locate each
    shard, one Arrow pass per shard; the kernel's Python loop is per
    PACK, not per row. DuckDB oracle: the same recurrence as a recursive
    CTE (exact for test scales)."""
    # project BEFORE any exchange (guide §2.3): the only text-derived
    # value downstream is n_tok, so tokenize in the scan stage and let
    # the narrow (doc_id, shard, n_tok) rows ride the shuffles — spreading
    # the raw text first shipped the whole corpus through an exchange to
    # parallelize a trivial split (measured 2.8 s -> ~0.6 s at sf1)
    df = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        pdf["pack_id"] = _greedy_pack(pdf["n_tok"].to_numpy(), _PACK_BUDGET)
        return pdf[["doc_id", "shard", "pack_id", "n_tok"]]

    return df.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, pack_id long, n_tok int"
    )


ORACLE_PACK_SEQUENCES = f"""
with recursive d as (
  select doc_id, doc_id % {_PACK_SHARDS} as shard,
         len(string_split(text, ' ')) as n_tok
  from documents
),
o as (
  select *, row_number() over (partition by shard order by doc_id) as rn from d
),
rec(shard, rn, doc_id, n_tok, acc, pack_id) as (
  select shard, rn, doc_id, n_tok, n_tok, 0::BIGINT from o where rn = 1
  union all
  select o.shard, o.rn, o.doc_id, o.n_tok,
         case when r.acc + o.n_tok > {_PACK_BUDGET} then o.n_tok
              else r.acc + o.n_tok end,
         case when r.acc + o.n_tok > {_PACK_BUDGET} then r.pack_id + 1
              else r.pack_id end
  from rec r join o on o.shard = r.shard and o.rn = r.rn + 1
)
select doc_id, shard, pack_id, cast(n_tok as int) as n_tok from rec
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

_SAMPLE_K = 5  # documents kept per stratum


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample: within each language stratum, rank
    documents by md5(doc_id) (a fixed pseudo-random order reproducible in
    any engine) and keep the top {k}. Emits (doc_id, lang, sample_rank).

    Scale shape: one shuffle on the stratum key; per-stratum top-k is a
    window rank here (fine while strata >> cores); at extreme per-stratum
    sizes you'd swap rank for a hash-threshold filter (keep h < k/N_est)
    which needs no sort at all — same determinism, zero-shuffle."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= _SAMPLE_K)
    )


ORACLE_STRATIFIED_SAMPLE = f"""
with rk as (
  select doc_id, lang,
         row_number() over (
           partition by lang order by md5(cast(doc_id as varchar)), doc_id
         ) as sample_rank
  from documents
)
select doc_id, lang, sample_rank from rk where sample_rank <= {_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# repetition / boilerplate detection
# ---------------------------------------------------------------------------

# word-3-gram expression WITH multiplicity (unlike text_queries' distinct
# shingles — repetition is exactly what dedup's distinct throws away)
_SPARK_TRI = (
    "case when size(t) >= 3 then "
    "transform(sequence(1, size(t) - 2), "
    "i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), element_at(t, i+2))) "
    "else array() end"
)

_DUCK_TRI = """
with toks as (
  select doc_id, string_split(text, ' ') as t from documents
),
tri as (
  select doc_id, array_to_string(t[i:i+2], ' ') as g
  from toks, lateral (select unnest(range(1, greatest(len(t) - 1, 1))) as i)
)
"""


def q_repetition_ratio(spark, sf_dir):
    """Boilerplate/repetition detector: the share of a document's word
    3-grams taken by its single most repeated 3-gram (1.0 ≈ one phrase
    looped; ~1/n_grams ≈ no repetition), plus that top 3-gram (ties →
    lexicographically smallest). Documents under 3 tokens get ratio 0.

    Scale shape: explode → two-level aggregation, all map-side-combinable;
    the per-(doc, gram) count shuffle keys on doc_id+gram so no single
    hot gram can skew a reducer (unlike corpus-wide gram counts)."""
    return repetition_ratio_df(
        spread_small_scan(_docs(spark, sf_dir), "doc_id")
    )


def repetition_ratio_df(docs):
    """Repetition detector over any (doc_id, text) DataFrame."""
    c = (
        docs
        .withColumn("t", F.split("text", " "))
        .withColumn("g", F.explode(F.expr(_SPARK_TRI)))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("doc_id")
    agg = (
        c.withColumn("n_grams", F.sum("cnt").over(w))
        .withColumn("max_rep", F.max("cnt").over(w))
        .where(F.col("cnt") == F.col("max_rep"))
        .groupBy("doc_id", "n_grams", "max_rep")
        .agg(F.min("g").alias("top_gram"))
    )
    out = agg.select(
        "doc_id",
        "n_grams",
        "max_rep",
        # floor parts-per-million (see tfidf: round(double) of a simple
        # rational is a cross-engine tie hazard; integer ppm is exact)
        F.expr("(max_rep * cast(1000000 as bigint)) div n_grams").alias("rep_ppm"),
        "top_gram",
    )
    all_docs = docs.select("doc_id")
    return (
        all_docs.join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("max_rep", F.lit(0)).alias("max_rep"),
            F.coalesce("rep_ppm", F.lit(0)).alias("rep_ppm"),
            F.coalesce("top_gram", F.lit("")).alias("top_gram"),
        )
    )


ORACLE_REPETITION_RATIO = (
    _DUCK_TRI
    + """,
c as (select doc_id, g, count(*) as cnt from tri group by 1, 2),
agg as (
  select doc_id, cast(sum(cnt) as bigint) as n_grams, max(cnt) as max_rep
  from c group by doc_id
),
top as (
  select c.doc_id, min(c.g) as top_gram
  from c join agg on c.doc_id = agg.doc_id and c.cnt = agg.max_rep
  group by c.doc_id
)
select d.doc_id,
       coalesce(a.n_grams, 0) as n_grams,
       coalesce(a.max_rep, 0) as max_rep,
       coalesce((a.max_rep * 1000000::BIGINT) // a.n_grams, 0) as rep_ppm,
       coalesce(t.top_gram, '') as top_gram
from documents d
left join agg a on a.doc_id = d.doc_id
left join top t on t.doc_id = d.doc_id
"""
)


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

_TFIDF_K = 3


def q_tfidf_top_terms(spark, sf_dir):
    """Top-{k} characteristic terms per document by raw TF-IDF (term
    frequency × inverse document frequency, idf as the exact rational
    1/df — one correctly-rounded IEEE division, so the ranking key is
    bit-identical across engines; ties → term asc).

    Scale shape: token explode → (doc, tok) counts (one shuffle, map-side
    combine) → df via a count window on tok (second shuffle; reused for
    the join) → per-doc top-k window. No floats until the final ranking
    division; no collect."""
    tf = (
        spread_small_scan(_docs(spark, sf_dir), "doc_id")
        .withColumn("tok", F.explode(F.split("text", " ")))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_counts, "tok").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    # display score = exact integer parts-per-million via FLOOR division —
    # round(double, 6) of a simple rational like 1/3200 (= 0.0003125, a
    # 7th-decimal tie) rounds differently in Spark (shortest-decimal-repr
    # HALF_UP) and DuckDB (binary value); floor ppm is engine-independent
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= _TFIDF_K)
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "tf",
            "df",
            F.expr("(tf * cast(1000000 as bigint)) div df").alias("score_ppm"),
            "term_rank",
        )
    )


ORACLE_TFIDF_TOP_TERMS = f"""
with toks as (
  select doc_id, unnest(string_split(text, ' ')) as tok from documents
),
tf as (select doc_id, tok, count(*) as tf from toks group by 1, 2),
dfc as (select tok, count(*) as df from tf group by tok),
scored as (
  select tf.doc_id, tf.tok, tf.tf, dfc.df,
         cast(tf.tf as double) / dfc.df as score
  from tf join dfc using (tok)
),
rk as (
  select *, row_number() over (
    partition by doc_id order by score desc, tok asc
  ) as term_rank
  from scored
)
select doc_id, tok as term, tf, df,
       (tf * 1000000::BIGINT) // df as score_ppm, term_rank
from rk where term_rank <= {_TFIDF_K}
"""


# ---------------------------------------------------------------------------
# regex pattern / PII scan
# ---------------------------------------------------------------------------

# Patterns restricted to constructs Java regex (Spark) and RE2 (DuckDB)
# treat identically: plain classes and counted repetition, no lookarounds,
# no backreferences.
_PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PAT_URL = r"https?://[^ ]+"
_PAT_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PAT_LONGWORD = r"[A-Za-z]{8,}"


def q_pii_scan(spark, sf_dir):
    """PII / pattern scan: per document, counts of email-, URL- and
    phone-shaped spans plus long alphabetic tokens, and the length of the
    text after redacting all three PII shapes. (The synthetic corpus
    contains no PII by construction — those counts are zero here and
    exercised with planted rows in pytest — while the long-word count
    varies per document, keeping the regex path value-checked.)

    Scale shape: a pure per-row projection — no shuffle at all; regex
    evaluation stays JVM-side inside whole-stage codegen."""
    return pii_scan_df(_docs(spark, sf_dir))


def pii_scan_df(docs):
    """PII/pattern scan over any (doc_id, text) DataFrame."""
    t = F.col("text")

    def n(pat):
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(_PAT_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PAT_URL),
            F.lit("<URL>"),
        ),
        F.lit(_PAT_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        n(_PAT_EMAIL).alias("n_emails"),
        n(_PAT_URL).alias("n_urls"),
        n(_PAT_PHONE).alias("n_phones"),
        n(_PAT_LONGWORD).alias("n_long_words"),
        F.length(redacted).alias("redacted_len"),
    )


ORACLE_PII_SCAN = f"""
select doc_id,
       len(regexp_extract_all(text, '{_PAT_EMAIL}')) as n_emails,
       len(regexp_extract_all(text, '{_PAT_URL}')) as n_urls,
       len(regexp_extract_all(text, '{_PAT_PHONE}')) as n_phones,
       len(regexp_extract_all(text, '{_PAT_LONGWORD}')) as n_long_words,
       length(regexp_replace(regexp_replace(regexp_replace(text,
         '{_PAT_EMAIL}', '<EMAIL>', 'g'),
         '{_PAT_URL}', '<URL>', 'g'),
         '{_PAT_PHONE}', '<PHONE>', 'g')) as redacted_len
from documents
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 4  # n-gram width: long enough that shared n-grams signal copying
# (production decontamination uses 8-13; 4 fits this synthetic corpus's
# n-gram repetition profile so the verdict column is actually exercised)
_EVAL_MOD = 97  # doc_id % 97 == 0 → the held-out "benchmark" set


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    word-_DECON_N-gram (4 here) with the held-out eval set (doc_id %
    _EVAL_MOD == 0 stands in for the benchmark corpus). For each training
    document: the number of distinct eval-overlapping grams and the
    contamination verdict.

    Scale shape: the train and eval sides explode to (gram, doc) and meet
    in an equi-join ON THE GRAM — never a doc×doc product; the eval gram
    table is tiny relative to the corpus (and broadcastable when it fits,
    which Catalyst decides from stats). Longer n-grams make shared keys
    rarer, so the join output is sparse. At the production widths (8-13)
    hot grams are no concern; at this corpus's width (4) a boilerplate
    gram shared by many documents WOULD fan the join out — the
    MinHash-style df cap is the mitigation if that appears."""
    docs = _docs(spark, sf_dir)
    grams = (
        docs.withColumn("t", F.split("text", " "))
        .where(F.size("t") >= _DECON_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {_DECON_N - 1}), "
                    f"i -> concat_ws(' ', slice(t, i, {_DECON_N})))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    ev = grams.where(F.col("doc_id") % _EVAL_MOD == 0).select("g").distinct()
    train = grams.where(F.col("doc_id") % _EVAL_MOD != 0)
    hits = train.join(ev, "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_contaminated_grams")
    )
    base = docs.where(F.col("doc_id") % _EVAL_MOD != 0).select("doc_id")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
        (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("is_contaminated"),
    )


ORACLE_DECONTAMINATE = f"""
with toks as (
  select doc_id, string_split(text, ' ') as t from documents
),
grams as (
  select distinct doc_id, array_to_string(t[i:i+{_DECON_N - 1}], ' ') as g
  from toks, lateral (
    select unnest(range(1, greatest(len(t) - {_DECON_N - 2}, 1))) as i
  )
  where len(t) >= {_DECON_N}
),
ev as (select distinct g from grams where doc_id % {_EVAL_MOD} = 0),
train as (select * from grams where doc_id % {_EVAL_MOD} <> 0),
hits as (
  select doc_id, count(*) as n_contaminated_grams
  from train join ev using (g) group by doc_id
)
select d.doc_id,
       coalesce(h.n_contaminated_grams, 0) as n_contaminated_grams,
       coalesce(h.n_contaminated_grams, 0) > 0 as is_contaminated
from documents d
left join hits h on h.doc_id = d.doc_id
where d.doc_id % {_EVAL_MOD} <> 0
"""


# ---------------------------------------------------------------------------
# bounded-vocab bigram language-model corpus-fit score
# ---------------------------------------------------------------------------

# vocabulary size: tokens outside the top-V by corpus frequency map to a
# single UNK sentinel, which bounds BOTH model tables — unigram contexts
# ≤ V+1 rows, bigrams ≤ (V+1)^2 — independent of corpus size. That is
# the whole 100 TB story: the model is an aggregate over a bounded key
# domain, so it broadcasts (or at worst equi-joins) at any input scale.
_LM_V = 1024
# UNK sentinel: \x01 cannot be a whitespace-split token (docs are ASCII
# text), and chr(1) spells it identically in Spark SQL and DuckDB
_LM_UNK = "\x01"


def q_lm_fit(spark, sf_dir):
    """Bigram language-model corpus-fit score per document (the
    perplexity-style quality signal of a training-data pipeline), with a
    top-{V}+UNK vocabulary and add-one smoothing, as exact integers.

    Model: vocab = top-{V} tokens by (count desc, token asc); every
    token maps to itself or UNK; bigram counts cbg(prev,cur) and context
    counts cun(prev) are corpus aggregates over the bounded vocab. Per
    document we report the exact integer aggregates (n_bigrams, n_oov,
    sum_cbg, sum_cun) and the pooled add-one-smoothed conditional
    likelihood as floor-ppm of ONE rational of two int64 sums:

        lm_fit_ppm = floor(1e6 * (Σcbg + n) / (Σcun + n*(V+1)))

    Per-position mean log-probability (the textbook per-doc score) is a
    sum of doubles whose result depends on summation order — not
    reproducible bit-for-bit across engines — so, per this module's
    determinism discipline, the shipped score is the pooled rational
    (same signal direction: gibberish scores low, corpus-typical text
    high) and everything in the row is value-hash exact.

    Scale shape: token posexplode → vocab TopK (TakeOrderedAndProject,
    V rows — broadcast) → lag window over (doc, position) (one shuffle
    by doc_id) → two bounded-domain aggregations → equi-joins back →
    per-doc aggregation. No cross product, no collect, no Python UDF.
    int64 headroom: sum_cbg*1e6 needs cbg sums < 9.2e12 — at the
    10^12-turn scale the model tables would be per-shard/per-epoch
    partitioned anyway, which also keeps the products in range."""
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(_LM_V)
        .select("w", F.lit(1).alias("in_v"))
    )
    m = tok.join(F.broadcast(vocab), "w", "left").select(
        "doc_id",
        "i",
        F.when(F.col("in_v").isNotNull(), F.col("w"))
        .otherwise(F.lit(_LM_UNK))
        .alias("wv"),
    )
    wspec = Window.partitionBy("doc_id").orderBy("i")
    b = (
        m.withColumn("prev", F.lag("wv").over(wspec))
        .where(F.col("prev").isNotNull())
        .select("doc_id", "prev", "wv")
    )
    bg = b.groupBy("prev", "wv").agg(F.count(F.lit(1)).alias("cbg"))
    un = b.groupBy("prev").agg(F.count(F.lit(1)).alias("cun"))
    scored = b.join(bg, ["prev", "wv"]).join(un, "prev")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("wv") == _LM_UNK).cast("long")).alias("n_oov"),
            F.sum("cbg").alias("sum_cbg"),
            F.sum("cun").alias("sum_cun"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_oov",
            "sum_cbg",
            "sum_cun",
            F.expr(
                "((sum_cbg + n_bigrams) * cast(1000000 as bigint)) div "
                f"(sum_cun + n_bigrams * {_LM_V + 1})"
            ).alias("lm_fit_ppm"),
        )
    )


ORACLE_LM_FIT = f"""
with tok as (
  select doc_id,
         generate_subscripts(string_split(text, ' '), 1) as i,
         unnest(string_split(text, ' ')) as w
  from documents
),
vocab as (
  select w from (
    select w, count(*) as c from tok group by w
    order by c desc, w asc limit {_LM_V}
  )
),
m as (
  select t.doc_id, t.i,
         case when v.w is null then chr(1) else t.w end as wv
  from tok t left join vocab v on t.w = v.w
),
b as (
  select doc_id, wv,
         lag(wv) over (partition by doc_id order by i) as prev
  from m
),
b2 as (select * from b where prev is not null),
bg as (select prev, wv, count(*) as cbg from b2 group by 1, 2),
un as (select prev, count(*) as cun from b2 group by 1)
select b2.doc_id,
       count(*) as n_bigrams,
       cast(sum(case when b2.wv = chr(1) then 1 else 0 end) as bigint) as n_oov,
       cast(sum(bg.cbg) as bigint) as sum_cbg,
       cast(sum(un.cun) as bigint) as sum_cun,
       cast((cast(sum(bg.cbg) as bigint) + count(*)) * 1000000::BIGINT as bigint)
         // (cast(sum(un.cun) as bigint) + count(*) * {_LM_V + 1}) as lm_fit_ppm
from b2
join bg on b2.prev = bg.prev and b2.wv = bg.wv
join un on b2.prev = un.prev
group by b2.doc_id
"""


# ---------------------------------------------------------------------------
# Token-budget document chunking with overlap (the pretraining chunker)
# ---------------------------------------------------------------------------

_CHUNK_C = 64  # tokens per training chunk
_CHUNK_O = 16  # tokens of overlap replicated from the previous chunk
_CHUNK_S = _CHUNK_C - _CHUNK_O  # stride between chunk starts


def q_doc_chunks(spark, sf_dir):
    """Split every document's token stream into fixed-budget training
    chunks of C=64 tokens starting every S=48 tokens, so consecutive
    chunks share an O=16-token overlap — the standard LLM-pretraining
    chunker, and the 1-D text twin of the engine's chunk-halo
    decomposition (streaming/engine.py hot_keys/chunk_span: same
    chunk + replicated-halo shape, there over event time, here over
    token position). A deterministic md5(doc_id)-bucket train/val/test
    split (98/1/1) rides along, so the output is directly shardable.

    Token i (0-based) belongs to chunk k iff k*S <= i < k*S + C, i.e.
    k in [max(0, floor((i-O)/S)), floor(i/S)] — at most ceil(C/S) = 2
    chunks per token, a bounded replication factor exactly like the
    halo's duration/span ratio. A trailing chunk whose tokens are ALL
    overlap (no token past its first O positions) is a subset of its
    predecessor and is dropped (n_new > 0), matching the halo kernels'
    own-row accounting.

    Scale shape: posexplode -> explode(sequence(k_lo, k_hi)) (<= 2x row
    replication, computed per-row JVM-side) -> ONE groupBy
    (doc_id, chunk_id). No cross product, no collect, no Python UDF;
    chunk_hash is md5 over the position-ordered token string
    (array_sort on (i, w) structs - exact, order-pinned), identical in
    DuckDB via string_agg(... order by i)."""
    C, O, S = _CHUNK_C, _CHUNK_O, _CHUNK_S
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    ex = tok.select(
        "doc_id",
        "i",
        "w",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.expr(f"(i - {O}) div {S}")),
                F.expr(f"i div {S}"),
            )
        ).alias("chunk_id"),
    )
    return (
        ex.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.min("i").alias("start_i"),
            F.max("i").alias("end_i"),
            F.sum(
                F.when(
                    (F.col("chunk_id") == 0)
                    | (F.col("i") >= F.col("chunk_id") * S + O),
                    1,
                ).otherwise(0)
            ).alias("n_new"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(i, w))),"
                        " x -> x.w)"
                    ),
                )
            ).alias("chunk_hash"),
        )
        .where(F.col("n_new") > 0)
        .withColumn(
            "split",
            F.expr(
                f"case when {spark_md5_60('doc_id')} % 100 < 98 then 'train'"
                f" when {spark_md5_60('doc_id')} % 100 = 98 then 'val'"
                " else 'test' end"
            ),
        )
    )


ORACLE_DOC_CHUNKS = f"""
with tok as (
  select doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 as i,
         unnest(string_split(text, ' ')) as w
  from documents
),
ex as (
  select doc_id, i, w,
         unnest(generate_series(greatest(0, (i - {_CHUNK_O}) // {_CHUNK_S}),
                                i // {_CHUNK_S})) as chunk_id
  from tok
)
select doc_id, chunk_id,
       count(*) as n_tok,
       min(i) as start_i,
       max(i) as end_i,
       cast(sum(case when chunk_id = 0
                       or i >= chunk_id * {_CHUNK_S} + {_CHUNK_O}
                     then 1 else 0 end) as bigint) as n_new,
       md5(string_agg(w, ' ' order by i)) as chunk_hash,
       case when {duck_md5_60('doc_id')} % 100 < 98 then 'train'
            when {duck_md5_60('doc_id')} % 100 = 98 then 'val'
            else 'test' end as split
from ex
group by doc_id, chunk_id,
         case when {duck_md5_60('doc_id')} % 100 < 98 then 'train'
              when {duck_md5_60('doc_id')} % 100 = 98 then 'val'
              else 'test' end
having sum(case when chunk_id = 0
                  or i >= chunk_id * {_CHUNK_S} + {_CHUNK_O}
                then 1 else 0 end) > 0
"""


# q_lm_fit / ORACLE_LM_FIT are NOT in QUERIES/ORACLES: the driver
# registry is at its 50-slot cap; the op gets the identical value-hash
# oracle comparison at pytest level (test_pipeline_ops) instead.
QUERIES = {
    "hll_users_by_type": q_hll_users_by_type,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "stratified_sample": q_stratified_sample,
    "repetition_ratio": q_repetition_ratio,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pii_scan": q_pii_scan,
}

ORACLES = {
    "hll_users_by_type": ORACLE_HLL_USERS_BY_TYPE,
    "decontaminate": ORACLE_DECONTAMINATE,
    "pack_sequences": ORACLE_PACK_SEQUENCES,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "repetition_ratio": ORACLE_REPETITION_RATIO,
    "tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
    "pii_scan": ORACLE_PII_SCAN,
}
