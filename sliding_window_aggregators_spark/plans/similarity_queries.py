"""Similarity search over the ``embeddings`` table (``vec_id``,
``embedding array<float>``, ``label``).

Determinism across engines: every cosine is computed over *scaled
integer* vectors (round(x·10^5) — exact in int64), so dot products and
norms are exact integers in both Spark and DuckDB; one final double
division + round(6) is bit-identical. Ordering ties broken by vec_id.

Scale shape (100 TB): the query set is broadcast (tiny dim table); the
brute-force variant is the correctness baseline; the IVF variant prunes
the scan to the probed clusters (the real 100 TB path: centroid assign =
one broadcast join, candidate search only inside matching clusters).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import spread_small_scan

_SCALE = 100_000
_TOPK = 5
_NQ = 8  # query vectors: vec_id < 8
_NEARDUP_TAU = 0.2
_IVF_K = 16  # centroids = first 16 vectors
_IVF_PROBE = 4

_INT_EMB = f"transform(embedding, x -> cast(round(cast(x as double) * {_SCALE}) as bigint))"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

_DUCK_INT_EMB = (
    f"list_transform(embedding, x -> cast(round(cast(x as double) * {_SCALE}) as bigint))"
)


def _emb(spark, sf_dir):
    # spread the single-row-group scan BEFORE the scaled-int projection +
    # norm: both are fused into the scan stage and otherwise run 1-task
    df = spread_small_scan(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id"
    )
    return df.withColumn("iv", F.expr(_INT_EMB)).withColumn(
        "norm", F.sqrt(F.expr(_DOT.format(a="iv", b="iv")).cast("double"))
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: the 8 query vectors broadcast against all
    candidates; exact integer dot/norms; rank by (cos desc, vec_id).
    The scaled-int projection feeds BOTH join sides — persist it once."""
    e = _emb(spark, sf_dir).persist()
    q = e.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("q_id"), F.col("iv").alias("q_iv"), F.col("norm").alias("q_norm")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("iv").alias("c_iv"), F.col("norm").alias("c_norm")
    )
    j = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(_DOT.format(a="q_iv", b="c_iv")).cast("double")
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOPK)
        .select("q_id", "rank", F.col("c_id").alias("neighbor_id"), "cosine")
    )


ORACLE_ANN_COSINE_TOPK = f"""
with e as (
  select vec_id, {_DUCK_INT_EMB} as iv from embeddings
),
n as (
  select vec_id, iv, sqrt(cast(list_inner_product(iv, iv) as double)) as norm from e
),
j as (
  select q.vec_id as q_id, c.vec_id as c_id,
         round(cast(list_inner_product(q.iv, c.iv) as double)
               / (q.norm * c.norm), 6) as cosine
  from n q join n c on q.vec_id < {_NQ} and q.vec_id <> c.vec_id
),
r as (
  select *, row_number() over (partition by q_id
                               order by cosine desc, c_id asc) as rank
  from j
)
select q_id, rank, c_id as neighbor_id, cosine from r where rank <= {_TOPK}
"""


# multi-table sign-LSH: _LSH_TABLES independent tables, each hashing the
# signs of _LSH_BITS distinct dimensions → 2^_LSH_BITS buckets per table.
# Candidates = union over tables of same-bucket pairs. vs the old single
# 4-bit table (16 buckets → O((n/16)²) pairs): 256 buckets per table cuts
# the per-bucket quadratic term ~256×, and 4 tables restore the recall
# narrower buckets lose (a near-dup pair agrees on all sign bits of one
# table with prob ≈ (1 − θ/π)^bits; any-of-4 keeps that high).
_LSH_TABLES = 4
_LSH_BITS = 8


def _lsh_bucket_expr(table: int, one_based: bool) -> str:
    """Bucket id of table t = sign bits of dims [t·8, t·8+8) packed into an
    int — same formula in Spark (0-based arrays) and DuckDB (1-based)."""
    dims = range(table * _LSH_BITS, (table + 1) * _LSH_BITS)
    if one_based:
        terms = [
            f"(case when iv[{d + 1}] >= 0 then {1 << j} else 0 end)"
            for j, d in enumerate(dims)
        ]
    else:
        terms = [
            f"cast(iv[{d}] >= 0 as int) * {1 << j}" for j, d in enumerate(dims)
        ]
    return " + ".join(terms)


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup via multi-table sign-LSH: 4 tables × 8
    hyperplane sign bits; candidate pairs share a bucket in ≥ 1 table;
    exact integer cosine verifies ≥ τ. The band join is equi (never a
    cross product) and the candidate pair set is deduped BEFORE the
    vectors are re-joined, so the 64-dim arrays never ride the band
    shuffle."""
    # the projection feeds the bucket pass AND both vector re-join sides
    e = _emb(spark, sf_dir).persist()
    # all 4 tables from ONE pass over the scaled-int projection (explode,
    # not a union of selects — union branches re-execute the projection
    # per branch per join side); the (vec_id, tbl, bucket) table is tiny
    bucket_structs = [
        F.struct(
            F.lit(t).alias("tbl"),
            F.expr(_lsh_bucket_expr(t, one_based=False)).alias("bucket"),
        )
        for t in range(_LSH_TABLES)
    ]
    buckets = (
        e.select("vec_id", F.explode(F.array(*bucket_structs)).alias("tb"))
        .select("vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
        .persist()
    )
    x = buckets.alias("x")
    y = buckets.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("doc_a"), F.col("y.vec_id").alias("doc_b"))
        .distinct()
    )
    va = e.select(
        F.col("vec_id").alias("doc_a"), F.col("iv").alias("ia"), F.col("norm").alias("na")
    )
    vb = e.select(
        F.col("vec_id").alias("doc_b"), F.col("iv").alias("ib"), F.col("norm").alias("nb")
    )
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn(
            "cosine",
            F.round(
                F.expr(_DOT.format(a="ia", b="ib")).cast("double")
                / (F.col("na") * F.col("nb")),
                6,
            ),
        )
        .where(F.col("cosine") >= _NEARDUP_TAU)
        .select("doc_a", "doc_b", "cosine")
    )


def _embed_neardup_oracle() -> str:
    tables = "\n  union all\n".join(
        f"select vec_id, {t} as tbl, {_lsh_bucket_expr(t, one_based=True)} as bucket from n"
        for t in range(_LSH_TABLES)
    )
    return f"""
with e as (
  select vec_id, {_DUCK_INT_EMB} as iv from embeddings
),
n as (
  select vec_id, iv, sqrt(cast(list_inner_product(iv, iv) as double)) as norm from e
),
buckets as (
  {tables}
),
cand as (
  select distinct x.vec_id as doc_a, y.vec_id as doc_b
  from buckets x join buckets y
    on x.tbl = y.tbl and x.bucket = y.bucket and x.vec_id < y.vec_id
)
select doc_a, doc_b,
       round(cast(list_inner_product(a.iv, b.iv) as double)
             / (a.norm * b.norm), 6) as cosine
from cand
join n a on a.vec_id = doc_a
join n b on b.vec_id = doc_b
where round(cast(list_inner_product(a.iv, b.iv) as double)
            / (a.norm * b.norm), 6) >= {_NEARDUP_TAU}
"""


ORACLE_EMBED_NEARDUP = _embed_neardup_oracle()


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: K=16 centroids (the first 16 vectors — deterministic
    'training'), every vector assigned to its nearest centroid, queries
    probe their 4 nearest centroid lists only. Exact integer math
    throughout so the SQL oracle agrees; the Spark plan broadcasts the
    centroid table and prunes candidates by cluster id before scoring."""
    # the scaled-int projection feeds the centroid table, the assignment,
    # the probes AND the candidate scoring — persist it once (an IVF
    # index build materializes exactly this in production)
    e = _emb(spark, sf_dir).persist()
    cents = e.where(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("iv").alias("cv"), F.col("norm").alias("cn")
    )
    scored = (
        e.select("vec_id", "iv", "norm")
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            F.round(
                F.expr(_DOT.format(a="iv", b="cv")).cast("double")
                / (F.col("norm") * F.col("cn")),
                6,
            ),
        )
        # assignment AND probes both rank this K×N score table — persist so
        # the centroid dot products (the expensive leg) run once, not twice
        .persist()
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    assign = (
        scored.withColumn("r", F.row_number().over(wa))
        .where(F.col("r") == 1)
        .select("vec_id", F.col("cent_id").alias("cluster"), "iv", "norm")
        .persist()  # the IVF inverted lists — read by probes and queries
    )
    probes = (
        scored.where(F.col("vec_id") < _NQ)
        .withColumn("r", F.row_number().over(wa))
        .where(F.col("r") <= _IVF_PROBE)
        .select(F.col("vec_id").alias("q_id"), F.col("cent_id").alias("cluster"))
    )
    q = assign.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("q_id"), F.col("iv").alias("q_iv"), F.col("norm").alias("q_norm")
    )
    cand = (
        F.broadcast(probes).join(assign, "cluster")
        .where(F.col("vec_id") != F.col("q_id"))
        .join(F.broadcast(q), "q_id")
        .withColumn(
            "cosine",
            F.round(
                F.expr(_DOT.format(a="q_iv", b="iv")).cast("double")
                / (F.col("q_norm") * F.col("norm")),
                6,
            ),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wq))
        .where(F.col("rank") <= _TOPK)
        .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


ORACLE_ANN_IVF_TOPK = f"""
with e as (
  select vec_id, {_DUCK_INT_EMB} as iv from embeddings
),
n as (
  select vec_id, iv, sqrt(cast(list_inner_product(iv, iv) as double)) as norm from e
),
cents as (select vec_id as cent_id, iv as cv, norm as cn from n where vec_id < {_IVF_K}),
scored as (
  select n.vec_id, cents.cent_id,
         round(cast(list_inner_product(n.iv, cents.cv) as double)
               / (n.norm * cents.cn), 6) as csim
  from n cross join cents
),
assign as (
  select vec_id, cent_id as cluster from (
    select *, row_number() over (partition by vec_id
                                 order by csim desc, cent_id asc) as r
    from scored
  ) where r = 1
),
probes as (
  select vec_id as q_id, cent_id as cluster from (
    select *, row_number() over (partition by vec_id
                                 order by csim desc, cent_id asc) as r
    from scored where vec_id < {_NQ}
  ) where r <= {_IVF_PROBE}
),
cand as (
  select p.q_id, a.vec_id,
         round(cast(list_inner_product(q.iv, c.iv) as double)
               / (q.norm * c.norm), 6) as cosine
  from probes p
  join assign a on a.cluster = p.cluster and a.vec_id <> p.q_id
  join n q on q.vec_id = p.q_id
  join n c on c.vec_id = a.vec_id
)
select q_id, rank, vec_id as neighbor_id, cosine from (
  select *, row_number() over (partition by q_id
                               order by cosine desc, vec_id asc) as rank
  from cand
) where rank <= {_TOPK}
"""


QUERIES = {
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embed_neardup_lsh": q_embed_neardup,
}

ORACLES = {
    "ann_cosine_topk": ORACLE_ANN_COSINE_TOPK,
    "ann_ivf_topk": ORACLE_ANN_IVF_TOPK,
    "embed_neardup_lsh": ORACLE_EMBED_NEARDUP,
}
