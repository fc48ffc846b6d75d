"""Training-data pipeline operators over the ``documents`` table:
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash), text
analysis (token counting, quality scoring, language-ID heuristic,
rolling-hash fingerprinting).

Every hash is derived from md5 (identical in Spark and DuckDB), and all
scoring arithmetic runs over exact integers before one final double
division, so each SQL-expressible query is bit-identical across engines.

Scale shape (100 TB): shingle explosion + groupBy is a single shuffle on
the shingle; candidate generation joins only within LSH bands/buckets
(never the full cross product); the doc-side tables (signatures) stay
columnar and broadcastable when small.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..sources.io import spread_small_scan

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

_P = 2_147_483_647  # 2^31 − 1
_N_HASH = 16
_BANDS = 4  # 4 bands × 4 rows
# deterministic permutation constants (affine hashes mod P); products stay
# within int64 because the base hash is reduced mod P first
_A = [(1_103_515_245 * (i + 1) * 2 + 1) % _P for i in range(_N_HASH)]
_B = [(12_345 + 987_654_321 * i) % _P for i in range(_N_HASH)]

_JACCARD_TAU = 0.2

# base hash of a shingle: first 8 hex chars of md5 → uint32 → mod P
_DUCK_H = "(('0x' || substr(md5(g), 1, 8))::BIGINT % {p})".format(p=_P)
_SPARK_H = f"(cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) % {_P})"

# hot-shingle skew guard: a stopword 3-gram ("of the and") can appear in
# nearly every document; at 100 TB its shingle-join fan-out is O(df²) on a
# single reducer key. Shingles with document frequency > _MAX_SHINGLE_DF
# are dropped from the shingle set (sizes AND intersections — i.e. treated
# as stopwords). Recall impact: only pairs whose similarity rests on
# near-ubiquitous shingles lose evidence, and those shingles carry no
# dedup signal (they match everything). Applied identically in the SQL
# oracles. At production scale this would be a fraction of the corpus
# (e.g. df > 0.1·N); pinned absolute here for cross-engine determinism.
_MAX_SHINGLE_DF = 100

_DUCK_SHINGLES = f"""
with toks as (
  select doc_id, string_split(text, ' ') as t from documents
),
tri as (
  select doc_id, array_to_string(t[i:i+2], ' ') as g
  from toks, lateral (select unnest(range(1, greatest(len(t) - 1, 1))) as i)
),
sh_all as (select distinct doc_id, g from tri),
ok as (select g from sh_all group by g having count(*) <= {_MAX_SHINGLE_DF}),
sh as (select sh_all.* from sh_all join ok using (g))
"""

_SPARK_TRI_EXPR = (
    "case when size(t) >= 3 then "
    "transform(sequence(1, size(t) - 2), "
    "i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), element_at(t, i+2))) "
    "else array() end"
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# the one persisted DF the text queries keep alive (for intra-query reuse
# across the df pass and the downstream self-joins); each _shingles call
# unpersists the previous one, so a long-lived session holds at most ONE
# shingle cache instead of leaking one per invocation. Callers that want
# storage back immediately call clear_shingle_cache().
_LIVE_SHINGLES = []


def clear_shingle_cache() -> None:
    while _LIVE_SHINGLES:
        try:
            _LIVE_SHINGLES.pop().unpersist()
        except Exception:  # session already stopped — nothing to release
            pass


def _shingles(spark, sf_dir):
    """Distinct word-3-gram shingles per doc (the MinHash/Jaccard base),
    with the hot-shingle guard applied: shingles appearing in more than
    ``_MAX_SHINGLE_DF`` documents are dropped via a map-side-combined
    document-frequency aggregate + broadcast anti-join (see the
    shuffle-structure note below)."""
    clear_shingle_cache()
    sh = (
        spread_small_scan(_docs(spark, sf_dir), "doc_id")
        .withColumn("t", F.split("text", " "))
        .withColumn("g", F.explode(F.expr(_SPARK_TRI_EXPR)))
        .select("doc_id", "g")
        .distinct()
        .persist()
    )
    _LIVE_SHINGLES.append(sh)
    # document frequency via groupBy(g): the partial aggregation runs
    # map-side, so even the hottest gram moves only per-partition counts
    # through the exchange — never its raw rows — and nothing SORTS the
    # shingle table (the previous count-window implementation sorted
    # every partition of it, hottest included). Only the OVER-cap grams
    # survive the filter — a set small enough to broadcast — so dropping
    # them is a broadcast anti-join with zero additional shuffle of sh;
    # sh is persisted so the df pass reads cached blocks instead of
    # re-scanning the corpus. The straggler the cap kills lives in
    # Jaccard's self-join (df² pairs on one reducer key); MinHash shares
    # the guard so both operators see one consistent shingle set.
    hot = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > _MAX_SHINGLE_DF)
        .select("g")
    )
    return sh.join(F.broadcast(hot), "g", "left_anti")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5(text) groups; keeper = min doc_id of the group."""
    df = spread_small_scan(_docs(spark, sf_dir), "doc_id").withColumn(
        "h", F.md5("text")
    )
    keep = df.groupBy("h").agg(
        F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        df.join(keep, "h")
        .select("doc_id", "keeper_id", "group_size",
                (F.col("doc_id") != F.col("keeper_id")).alias("is_duplicate"))
    )


ORACLE_DEDUP_EXACT = """
with h as (select doc_id, md5(text) as h from documents),
k as (select h, min(doc_id) as keeper_id, count(*) as group_size from h group by h)
select doc_id, keeper_id, group_size, doc_id <> keeper_id as is_duplicate
from h join k using (h)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard pairs ≥ τ: explode distinct shingles, self-join
    on shingle (never the doc cross product), |A∩B| by count, union by
    inclusion-exclusion. Integer counts → one double division → exact."""
    sh = _shingles(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    # |A∩B| without the sorted self-join: ONE exchange of sh (groupBy g),
    # per-gram sorted doc lists (bounded by the df cap), ordered pairs via
    # two codegen'd Generates — same pair multiset the g-equi-join
    # produced, minus the second exchange and both SMJ sorts of sh
    lists = sh.groupBy("g").agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    pair_src = lists.select("ds", F.posexplode("ds").alias("i", "doc_a")).select(
        "doc_a",
        F.explode(F.expr("slice(ds, i + 2, size(ds))")).alias("doc_b"),
    )
    # the (doc_a, doc_b) count is the heavy stage: ~|Σ C(df,2)| rows into
    # nearly as many groups (measured 67M groups from 71M pairs at sf1.0
    # — multiplicity ≈ 1.06, so partial aggregation barely reduces and
    # the exchange carries almost every pair). When doc ids fit 31 bits,
    # pack the pair into ONE long (measured ~25% faster agg: one 8-byte
    # key instead of two, one hash); ids outside that range keep the
    # two-column key. Same groups either way — the pack is a bijection.
    lo_hi = sh.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo_hi[0] is not None and lo_hi[0] >= 0 and lo_hi[1] < (1 << 31):
        inter = (
            pair_src.select(F.expr("shiftleft(doc_a, 32) | doc_b").alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("inter"))
            .select(
                F.expr("shiftright(p, 32)").alias("doc_a"),
                F.expr(f"p % {1 << 32}").alias("doc_b"),
                "inter",
            )
        )
    else:
        inter = pair_src.groupBy("doc_a", "doc_b").agg(
            F.count(F.lit(1)).alias("inter")
        )
    # similarity as exact integer parts-per-million via FLOOR division:
    # round(double, 6) of a simple rational (|A∩B| / |A∪B|) is a
    # cross-engine tie hazard (Spark rounds the shortest decimal repr,
    # DuckDB the binary value — e.g. 1/3200 = 0.0003125 splits them);
    # floor ppm of int64 counts is bit-identical by construction
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
        .withColumn(
            "jaccard_ppm",
            F.expr(
                "(inter * cast(1000000 as bigint)) div (sa + sb - inter)"
            ),
        )
        .where(F.col("jaccard_ppm") >= int(_JACCARD_TAU * 1_000_000))
        .select("doc_a", "doc_b", "jaccard_ppm")
    )
    return out


ORACLE_DEDUP_NGRAM_JACCARD = f"""
{_DUCK_SHINGLES},
sizes as (select doc_id, count(*) as sz from sh group by doc_id),
inter as (
  select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as i
  from sh a join sh b on a.g = b.g and a.doc_id < b.doc_id
  group by 1, 2
)
select doc_a, doc_b,
       (i * 1000000::BIGINT) // (sa.sz + sb.sz - i) as jaccard_ppm
from inter
join sizes sa on sa.doc_id = doc_a
join sizes sb on sb.doc_id = doc_b
where (i * 1000000::BIGINT) // (sa.sz + sb.sz - i) >= {int(_JACCARD_TAU * 1_000_000)}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 affine hashes mod 2^31−1 of the shingle md5) → 4 bands
    of 4 → candidate pairs sharing ≥ 1 band. Pure integer math, identical
    in the SQL oracle. At scale the band join touches only same-signature
    buckets (shingle→minhash→band→bucket-join; no cross product)."""
    sh = _shingles(spark, sf_dir).withColumn("h", F.expr(_SPARK_H))
    aggs = [
        F.min(F.expr(f"({a}L * h + {b}L) % {_P}")).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(_A, _B))
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    rows_per_band = _N_HASH // _BANDS
    # ONE pass over the signature aggregation: bands come out of an
    # explode, not a union of per-band selects (a 4-way union referenced
    # from both join sides would re-execute the whole shingle+minhash
    # pipeline 8×: Spark does not reuse exchanges across union branches),
    # and the tiny (doc, band, sig) table is persisted so the self-join's
    # two sides share one computation.
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            ).alias("sig"),
        )
        for b in range(_BANDS)
    ]
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
        .persist()
    )
    x = bands.alias("x")
    y = bands.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def _minhash_oracle() -> str:
    mh = ",\n    ".join(
        f"min(({a} * h + {b}) % {_P}) as mh{i}"
        for i, (a, b) in enumerate(zip(_A, _B))
    )
    rows_per_band = _N_HASH // _BANDS
    band_selects = "\n  union all\n".join(
        "select doc_id, {b} as band, concat_ws('_', {cols}) as sig from sig".format(
            b=b,
            cols=", ".join(
                f"cast(mh{b * rows_per_band + r} as varchar)" for r in range(rows_per_band)
            ),
        )
        for b in range(_BANDS)
    )
    return f"""
{_DUCK_SHINGLES},
hashed as (select doc_id, {_DUCK_H} as h from sh),
sig as (select doc_id, {mh} from hashed group by doc_id),
bands as (
  {band_selects}
)
select distinct x.doc_id as doc_a, y.doc_id as doc_b
from bands x join bands y
  on x.band = y.band and x.sig = y.sig and x.doc_id < y.doc_id
"""


ORACLE_DEDUP_MINHASH_LSH = _minhash_oracle()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIM_BITS = 32  # 8 hex chars of md5 → 32-bit token hash


def q_simhash(spark, sf_dir):
    """32-bit SimHash fingerprint per document: per-token md5-derived hash,
    each bit votes ±count, sign → fingerprint bit. Emitted as the bigint
    value of the bit vector."""
    toks = (
        spread_small_scan(_docs(spark, sf_dir), "doc_id")
        .withColumn("tok", F.explode(F.split("text", " ")))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "h", F.expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)")
        )
    )
    bit_votes = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) % 2 = 1"), F.col("cnt")).otherwise(-F.col("cnt"))
        ).alias(f"v{b}")
        for b in range(_SIM_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_votes)
    fp = None
    for b in range(_SIM_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.alias("simhash32"))


def _simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"sum(case when (h >> {b}) % 2 = 1 then cnt else -cnt end) as v{b}"
        for b in range(_SIM_BITS)
    )
    fp = " + ".join(
        f"(case when v{b} > 0 then {2 ** b}::BIGINT else 0 end)" for b in range(_SIM_BITS)
    )
    return f"""
with toks as (
  select doc_id, unnest(string_split(text, ' ')) as tok from documents
),
cnts as (select doc_id, tok, count(*) as cnt from toks group by 1, 2),
hashed as (
  select doc_id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT as h from cnts
),
votes as (select doc_id, {votes} from hashed group by doc_id)
select doc_id, {fp} as simhash32 from votes
"""


ORACLE_SIMHASH = _simhash_oracle()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation —
# the GPT-2-style split shape, restricted to constructs Java regex
# (Spark) and RE2 (DuckDB) treat identically (plain char classes, no
# lookarounds), so the token counts are bit-identical across engines.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q_token_stats(spark, sf_dir):
    """Token counting two ways (the pipeline mandate's "whitespace + a
    BPE-ish regex"): whitespace tokens, distinct whitespace tokens, and
    BPE-ish subword-boundary tokens."""
    df = _docs(spark, sf_dir).withColumn("t", F.split("text", " "))
    return df.select(
        "doc_id",
        F.length("text").alias("n_chars2"),
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_uniq_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")).alias(
            "n_bpe_tokens"
        ),
    )


ORACLE_TOKEN_STATS = f"""
select doc_id, length(text) as n_chars2,
       len(string_split(text, ' ')) as n_tokens,
       len(list_distinct(string_split(text, ' '))) as n_uniq_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}')) as n_bpe_tokens
from documents
"""


def q_quality_score(spark, sf_dir):
    """Deterministic quality heuristic: length saturation (0.4 weight) +
    lexical diversity (0.3) + mean token length saturation (0.3),
    computed as ONE exact rational — numerator and denominator are
    int64, so the single double division is bit-identical across engines
    (a three-term float sum + round() was tie-fragile: Spark rounds the
    shortest decimal repr, DuckDB the binary value; at sf0.1 two rows
    landed on a .xxxxxx5 tie and differed in the 6th decimal).

    quality = (nt·min(nc,400) + 300·nu + 30·min(10·nt, nc)) / (1000·nt)
    ≡ 0.4·min(1, nc/400) + 0.3·(nu/nt) + 0.3·min(1, (nc/nt)/10)."""
    df = _docs(spark, sf_dir).withColumn("t", F.split("text", " "))
    nc = F.length("text").cast("long")
    nt = F.size("t").cast("long")
    nu = F.size(F.array_distinct("t")).cast("long")
    num = nt * F.least(nc, F.lit(400)) + 300 * nu + 30 * F.least(10 * nt, nc)
    score = num.cast("double") / (1000 * nt).cast("double")
    return df.select("doc_id", score.alias("quality"))


ORACLE_QUALITY_SCORE = """
with t as (
  select doc_id, cast(length(text) as bigint) as nc,
         cast(len(string_split(text, ' ')) as bigint) as nt,
         cast(len(list_distinct(string_split(text, ' '))) as bigint) as nu
  from documents
)
select doc_id,
       cast(nt * least(nc, 400) + 300 * nu + 30 * least(10 * nt, nc) as double)
         / cast(1000 * nt as double) as quality
from t
"""


_STOP = ["the", "a", "of", "and", "to"]


def q_lang_id(spark, sf_dir):
    """Stopword-ratio language-ID heuristic (n-gram-free variant): share of
    English stopword tokens; ≥ 2% → 'en' else 'unk'. The ratio is exact
    integer parts-per-million (floor division) — round(double, 6) of the
    simple rational n_stop/n_tokens is the cross-engine tie hazard this
    file eliminates everywhere else."""
    df = _docs(spark, sf_dir).withColumn("t", F.split("text", " "))
    ppm = F.expr(
        f"(size(filter(t, x -> array_contains(array({','.join(repr(w) for w in _STOP)}), x)))"
        " * cast(1000000 as bigint)) div size(t)"
    )
    return df.select(
        "doc_id",
        ppm.alias("stop_ppm"),
        F.when(ppm >= 20_000, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
        "lang",
    )


ORACLE_LANG_ID = """
with t as (
  select doc_id, lang, string_split(text, ' ') as toks from documents
),
r as (
  select doc_id, lang,
         (len(list_filter(toks, x -> x in ('the','a','of','and','to')))
          * 1000000::BIGINT) // len(toks) as stop_ppm
  from t
)
select doc_id, stop_ppm,
       case when stop_ppm >= 20000 then 'en' else 'unk' end as pred_lang, lang
from r
"""


# ---------------------------------------------------------------------------
# rolling-hash fingerprint (vectorized pandas kernel; rows-only check)
# ---------------------------------------------------------------------------

# Mersenne prime modulus 2^31−1 with a base < 2^20 keeps every Horner
# step's product < 2^52 — exact in uint64, no overflow before the mod
_FP_BASE = np.uint64(1_000_003)
_FP_MASK = np.uint64((1 << 31) - 1)


def rolling_fingerprint(texts: pd.Series) -> np.ndarray:
    """Polynomial rolling hash of each text mod 2^31−1, fully vectorized:
    pad to a char matrix, Horner by column (O(max_len) vector steps)."""
    arr = texts.fillna("").to_numpy(dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    encoded = [s.encode("utf-8") for s in arr]
    lens = np.array([len(b) for b in encoded])  # BYTE lengths (utf-8 safe)
    mx = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(arr), mx), dtype=np.uint64)
    for i, b in enumerate(encoded):  # byte-copy only; math below is columnar
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(len(arr), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in range(mx):
            live = c < lens
            nh = (h * _FP_BASE + mat[:, c]) % _FP_MASK
            h = np.where(live, nh, h)
    return h.astype(np.int64)


def q_doc_fingerprint(spark, sf_dir):
    """Rolling-hash fingerprints via mapInPandas (the multimodal/binary
    column plumbing pattern: Arrow batches in, vectorized numpy, Arrow
    out). Full DuckDB oracle via list_reduce Horner (see
    ORACLE_DOC_FINGERPRINT; exact for the all-ASCII corpus) plus a
    pure-Python pytest oracle covering non-ASCII."""
    df = _docs(spark, sf_dir)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fingerprint": rolling_fingerprint(pdf["text"])}
            )

    return spread_small_scan(df.select("doc_id", "text"), "doc_id").mapInPandas(
        gen, "doc_id long, fingerprint long"
    )


# Horner over characters via list_reduce — a full value oracle after all
# (the hash is a left fold, no modpow needed). The kernel hashes UTF-8
# BYTES while unicode(c) yields code points, so the oracle is exact for
# ASCII corpora (the synthetic documents table is all-ASCII; verified
# bit-for-bit over every row at sf0.01).
ORACLE_DOC_FINGERPRINT = f"""
select doc_id,
       case when length(text) = 0 then 0 else
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(string_split(text, ''), c -> cast(unicode(c) as bigint))),
           (h, b) -> (h * {int(_FP_BASE)} + b) % {int(_FP_MASK)})
       end as fingerprint
from documents
"""


_SIM_HAM_T = 6
# Half-ball pigeonhole: split the 32 bits into two 16-bit halves with
# radii (r0, r1) = (2, 3). Any pair with d0 > 2 AND d1 > 3 has hamming
# ≥ 7, so probing the radius-2 ball of each value's LOW half plus the
# radius-3 ball of its HIGH half against the exact half values finds
# EVERY pair with hamming ≤ 6 — no recall loss, and candidates come from
# 16-bit buckets instead of the 4-5-bit buckets the old 7-band scheme
# used. r0 + r1 = 5 is the minimal pigeonhole budget; putting the larger
# radius on the high half exploits the corpus's heavier low-half-value
# clustering (measured at sf1.0: 1.69e9 band-join candidates → 3.4e8
# ball probes hitting, with every join broadcastable).
_SIM_HALF_R0 = 2
_SIM_HALF_R1 = 3
_SIM_HALF_BITS = _SIM_BITS // 2
_SIM_HALF_MASK = (1 << _SIM_HALF_BITS) - 1


def _half_ball_codes() -> list[int]:
    """(half, xor-mask) probe codes packed as half·2^20 | mask: the
    radius-r0 Hamming ball of the low half and radius-r1 ball of the
    high half."""
    import itertools

    codes = []
    for h, radius in ((0, _SIM_HALF_R0), (1, _SIM_HALF_R1)):
        masks = [0]
        for r in range(1, radius + 1):
            for combo in itertools.combinations(range(_SIM_HALF_BITS), r):
                m = 0
                for b in combo:
                    m |= 1 << b
                masks.append(m)
        codes.extend(h << 20 | m for m in masks)
    return codes


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: hamming ≤ 6 on the 32-bit fingerprints.

    Output is identical to the all-pairs definition (the SQL oracle IS
    all-pairs), found without any all-pairs work OR any large shuffle:

    1. dedup to DISTINCT fingerprint values (collisions are the norm in
       a near-dup corpus — pair finding is O(values), doc expansion is
       output-sized);
    2. value-level candidates via the 2-half (radius-2, radius-3)
       Hamming-ball pigeonhole (see ``_half_ball_codes``): explode each
       value into 834 probe variants and equi-join them against the exact half
       values — a BroadcastHashJoin probing a |values|-sized build side,
       zero shuffle of the probe stream;
    3. each qualifying unordered value pair is kept EXACTLY once — via
       half 0 when its low halves differ in ≤ 2 bits, else via half 1 —
       so no distinct/dedup shuffle exists anywhere;
    4. doc expansion: broadcast-join the (value → doc) table onto both
       sides of the qualifying value pairs (plus the intra-value pairs at
       hamming 0). At extreme corpus scale these expansion joins revert
       to plain hash equi-joins; they are output-sized either way."""
    fp = q_simhash(spark, sf_dir).persist()
    n_par = spark.sparkContext.defaultParallelism
    vals = fp.select("simhash32").distinct().repartition(n_par).persist()
    ex = vals.select(
        F.col("simhash32").alias("v"),
        F.explode(F.lit(_half_ball_codes())).alias("code"),
    ).select(
        "v",
        F.expr("cast(code div 1048576 as int)").alias("half"),
        F.expr(
            f"(shiftright(v, {_SIM_HALF_BITS} * (code div 1048576)) "
            f"% {_SIM_HALF_MASK + 1}) ^ (code % {_SIM_HALF_MASK + 1})"
        ).alias("variant"),
    )
    y = vals.select(
        F.col("simhash32").alias("v2"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("half"),
                    F.expr(f"simhash32 % {_SIM_HALF_MASK + 1}").alias("hv"),
                ),
                F.struct(
                    F.lit(1).alias("half"),
                    F.expr(
                        f"shiftright(simhash32, {_SIM_HALF_BITS}) "
                        f"% {_SIM_HALF_MASK + 1}"
                    ).alias("hv"),
                ),
            )
        ).alias("s"),
    ).select("v2", F.col("s.half").alias("half"), F.col("s.hv").alias("variant"))
    vp = (
        ex.join(
            F.broadcast(y),
            ["half", "variant"],
        )
        .where(F.col("v") < F.col("v2"))
        .withColumn("hamming", F.expr("bit_count(v ^ v2)"))
        # first-qualifying-half rule: a pair within BOTH balls is found
        # via both probes; keep the half-0 copy exactly when d0 ≤ r0
        .where(
            (F.col("hamming") <= _SIM_HAM_T)
            & (
                (F.col("half") == 0)
                | (F.expr(f"bit_count((v ^ v2) % {_SIM_HALF_MASK + 1})") > _SIM_HALF_R0)
            )
        )
        .select("v", "v2", "hamming")
    )
    docs_a = fp.select(F.col("simhash32").alias("v"), F.col("doc_id").alias("ida"))
    docs_b = fp.select(F.col("simhash32").alias("v2"), F.col("doc_id").alias("idb"))
    cross = (
        vp.join(F.broadcast(docs_a), "v")
        .join(F.broadcast(docs_b), "v2")
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
            "hamming",
        )
    )
    intra = (
        fp.select(F.col("simhash32").alias("v"), F.col("doc_id").alias("doc_a"))
        .join(
            F.broadcast(
                fp.select(F.col("simhash32").alias("v"), F.col("doc_id").alias("doc_b"))
            ),
            "v",
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).alias("hamming"))
    )
    return cross.unionByName(intra)


ORACLE_DEDUP_SIMHASH_PAIRS = (
    "with fp as (" + _simhash_oracle() + ")\n"
    """
select a.doc_id as doc_a, b.doc_id as doc_b,
       bit_count(xor(a.simhash32, b.simhash32)) as hamming
from fp a join fp b on a.doc_id < b.doc_id
where bit_count(xor(a.simhash32, b.simhash32)) <= 6
"""
)


def _large_star(e):
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): for every node u with neighborhood
    Γ(u), connect each strictly larger neighbor v > u to
    m = min(Γ(u) ∪ {u}). Strictly decreases large-id→large-id edges."""
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e):
    """Small-star round: orient every edge large→small; each center u
    links all its (smaller) neighbors and itself to m = min neighbor."""
    d = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    return (
        d.join(mins, "u")
        .select(F.explode(F.array("v", "u")).alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


# bounded local endgame (the GraphFrames finish): once the (contracted)
# edge set fits comfortably on the driver, union-find there instead of
# paying several distributed jobs per remaining round. 200k edges ≈ a
# few MB — far below any driver's memory, and the ONLY collect in the
# plan library, explicitly bounded by this constant.
_CC_LOCAL_EDGES = 200_000


def _cc_local_labels(spark, e):
    """Exact union-find over a collected (bounded) edge list → (u, lbl)
    DataFrame with lbl = min doc_id of u's component."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in e.collect():
        a, b = row["a"], row["b"]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the keeper
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(int(u), int(find(u))) for u in parent]
    return spark.createDataFrame(rows or [(0, 0)], "u long, lbl long").where(
        F.lit(bool(rows))
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: connected components over the MinHash-LSH pair
    graph, keeper = min doc_id per component — the step that turns pair
    lists into dedup decisions (keep/drop) at corpus scale.

    Spark-first iterative algorithm: alternating large-star/small-star
    rounds (Kiveris et al., SoCC'14 — the schedule behind GraphFrames'
    connectedComponents), which converge in O(log n) rounds REGARDLESS of
    component diameter — unlike plain min-label propagation, whose
    O(diameter) rounds serialize on a high-diameter component at 100 TB.
    Each round is two groupBy-min aggregations + equi-joins, all
    distributed; per-round edges shrink toward the final star graph. The
    driver-side work per round is ONE convergence count (edges whose two
    endpoints disagree on their tentative star label — zero exactly at
    convergence), so total driver barriers are O(log n). Once the
    (contracted) edge set drops below ``_CC_LOCAL_EDGES`` the endgame is
    an exact driver-side union-find — the same bounded local finish
    GraphFrames uses — replacing several small jobs per remaining round
    with one bounded collect.

    DuckDB oracle: reachability closure via WITH RECURSIVE + min label
    per node (exact for the test corpus sizes)."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    docs = spread_small_scan(_docs(spark, sf_dir).select("doc_id"), "doc_id")
    # iterate ONLY over edge-incident nodes: at corpus scale the vast
    # majority of documents are isolated (their own keeper by definition)
    # and must not ride the star rounds; they are unioned back at the end
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).cache()
    labels = None
    converged = False
    for _round in range(40):  # ≫ the O(log n) bound for any real corpus
        if e.count() <= _CC_LOCAL_EDGES:
            labels = _cc_local_labels(spark, e)
            converged = True
            print(
                f"# dedup_clusters: local endgame after {_round} star rounds",
                file=sys.stderr,
            )
            break
        # localCheckpoint (not cache): each star round references the
        # previous edge set 4×, so an uncut lineage grows 4^rounds and
        # Catalyst analysis time explodes around round 7 — checkpointing
        # truncates the plan to the materialized blocks (a cluster
        # deployment would use a reliable checkpoint dir instead)
        e2 = _small_star(_large_star(e)).localCheckpoint()
        sym = e2.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e2.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        lab = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("lbl"))
        ).cache()
        # converged ⟺ every edge joins two nodes with one star label
        # (then labels are constant per component and equal its min id)
        bad = (
            e2.join(
                lab.select(F.col("u").alias("a"), F.col("lbl").alias("la")), "a"
            )
            .join(lab.select(F.col("u").alias("b"), F.col("lbl").alias("lb")), "b")
            .where(F.col("la") != F.col("lb"))
            .count()
        )
        if e.is_cached:
            e.unpersist()
        e = e2
        if bad == 0:
            labels = lab
            converged = True
            print(f"# dedup_clusters: {_round + 1} star rounds", file=sys.stderr)
            break
        lab.unpersist()
    if not converged:
        # a silent cap would return WRONG clusters; refuse instead
        raise RuntimeError(
            "dedup_clusters: star rounds did not converge within the bound"
        )
    clustered = labels.select(
        F.col("u").alias("doc_id"),
        F.col("lbl").alias("keeper_id"),
        (F.col("u") != F.col("lbl")).alias("is_duplicate"),
    )
    isolated = docs.join(
        labels.select(F.col("u").alias("doc_id")), "doc_id", "left_anti"
    ).select(
        "doc_id", F.col("doc_id").alias("keeper_id"), F.lit(False).alias("is_duplicate")
    )
    return clustered.unionByName(isolated)


ORACLE_DEDUP_CLUSTERS = f"""
with recursive pairs as (
{_minhash_oracle()}
),
edges as (
  select doc_a as a, doc_b as b from pairs
  union all
  select doc_b as a, doc_a as b from pairs
),
reach(node, lbl) as (
  select doc_id, doc_id from documents
  union
  select e.b, r.lbl from reach r join edges e on e.a = r.node
)
select node as doc_id, min(lbl) as keeper_id,
       min(lbl) <> node as is_duplicate
from reach group by node
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "simhash32": q_simhash,
    "token_stats": q_token_stats,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "dedup_simhash_pairs": ORACLE_DEDUP_SIMHASH_PAIRS,
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM_JACCARD,
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH_LSH,
    "simhash32": ORACLE_SIMHASH,
    "token_stats": ORACLE_TOKEN_STATS,
    "quality_score": ORACLE_QUALITY_SCORE,
    "lang_id": ORACLE_LANG_ID,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
}
