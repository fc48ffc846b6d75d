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
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.withColumn("iv", F.expr(_INT_EMB)).withColumn(
        "norm", F.sqrt(F.expr(_DOT.format(a="iv", b="iv")).cast("double"))
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: the 8 query vectors broadcast against all
    candidates; exact integer dot/norms; rank by (cos desc, vec_id)."""
    e = _emb(spark, sf_dir)
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


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup with sign-LSH bucketing: bucket = sign
    bits of the first 4 dimensions (16 buckets); candidate pairs only
    within a bucket (the O(n²)-avoiding scale path; recall bounded by the
    hyperplane family, as in classic SimHash LSH)."""
    e = _emb(spark, sf_dir).withColumn(
        "bucket",
        F.expr(
            "cast(iv[0] >= 0 as int) * 8 + cast(iv[1] >= 0 as int) * 4 "
            "+ cast(iv[2] >= 0 as int) * 2 + cast(iv[3] >= 0 as int)"
        ),
    )
    a = e.select(
        F.col("bucket").alias("ba"), F.col("vec_id").alias("doc_a"),
        F.col("iv").alias("ia"), F.col("norm").alias("na"),
    )
    b = e.select(
        F.col("bucket").alias("bb"), F.col("vec_id").alias("doc_b"),
        F.col("iv").alias("ib"), F.col("norm").alias("nb"),
    )
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("doc_a") < F.col("doc_b")))
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


ORACLE_EMBED_NEARDUP = f"""
with e as (
  select vec_id, {_DUCK_INT_EMB} as iv from embeddings
),
n as (
  select vec_id, iv,
         sqrt(cast(list_inner_product(iv, iv) as double)) as norm,
         (case when iv[1] >= 0 then 8 else 0 end
          + case when iv[2] >= 0 then 4 else 0 end
          + case when iv[3] >= 0 then 2 else 0 end
          + case when iv[4] >= 0 then 1 else 0 end) as bucket
  from e
)
select a.vec_id as doc_a, b.vec_id as doc_b,
       round(cast(list_inner_product(a.iv, b.iv) as double)
             / (a.norm * b.norm), 6) as cosine
from n a join n b on a.bucket = b.bucket and a.vec_id < b.vec_id
where round(cast(list_inner_product(a.iv, b.iv) as double)
            / (a.norm * b.norm), 6) >= {_NEARDUP_TAU}
"""


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: K=16 centroids (the first 16 vectors — deterministic
    'training'), every vector assigned to its nearest centroid, queries
    probe their 4 nearest centroid lists only. Exact integer math
    throughout so the SQL oracle agrees; the Spark plan broadcasts the
    centroid table and prunes candidates by cluster id before scoring."""
    e = _emb(spark, sf_dir)
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
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    assign = (
        scored.withColumn("r", F.row_number().over(wa))
        .where(F.col("r") == 1)
        .select("vec_id", F.col("cent_id").alias("cluster"), "iv", "norm")
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
