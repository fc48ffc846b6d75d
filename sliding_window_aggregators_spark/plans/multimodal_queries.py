"""Multimodal pipeline queries: binary media columns with typed metadata,
decode/resize/frame-sample/feature-extract as Arrow-batched mapInPandas
ops (decode stubbed deterministically — see operators/multimodal.py).

``multimodal_meta`` has a full SQL oracle: every metadata derivation
(kind, dims, thumbnail fit, frame sampling, audio duration) is integer
math on doc_id, so DuckDB reproduces it without touching the blobs.
``multimodal_features`` additionally runs the (fake-)decoded pixel plane
through feature extraction — not SQL-expressible → rows-only + pytest.
"""

from __future__ import annotations

from ..operators.multimodal import media_features, media_metadata, synth_media
from ..sources.io import spread_small_scan


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the blob synthesis + feature extraction are Arrow map passes fused
    # after the scan: spread the single-row-group file scan first or the
    # whole decode pipeline runs on one core (guide §2.5 input skew)
    return synth_media(spread_small_scan(docs.select("doc_id"), "doc_id"))


def q_multimodal_meta(spark, sf_dir):
    """Metadata extraction only — runs the decode-FREE pass
    (operators/multimodal.py media_metadata): a metadata pipeline must
    not pay for pixel decode, exactly as a production pipeline reads
    container headers without demuxing frames. (media_features' meta
    columns are pinned equal to this in tests/test_multimodal.py.)"""
    return media_metadata(_media(spark, sf_dir))


ORACLE_MULTIMODAL_META = """
with m as (
  select doc_id,
         case doc_id % 3 when 0 then 'image' when 1 then 'audio' else 'video' end as kind,
         64 + 16 * ((doc_id * 37) % 28) as width,
         64 + 16 * ((doc_id * 53) % 28) as height,
         case when doc_id % 3 = 2 then 8 + (doc_id % 24) else 1 end as n_frames,
         case when doc_id % 3 = 1 then 16000 else 0 end as sample_rate
  from documents
),
t as (
  select *,
         greatest((width * 128) // greatest(width, height), 1) as thumb_w,
         greatest((height * 128) // greatest(width, height), 1) as thumb_h,
         (width * height) // 16 as blob_bytes
  from m
)
select doc_id, kind, cast(thumb_w as int) as thumb_w, cast(thumb_h as int) as thumb_h,
       cast(case when kind = 'video' then (n_frames + 3) // 4 else 0 end as int)
         as sampled_frames,
       cast(case when kind = 'audio'
                 then (blob_bytes * 1000000) // sample_rate else 0 end as bigint)
         as audio_usec
from t
"""


def q_multimodal_features(spark, sf_dir):
    """Full pipeline incl. (stub-)decoded pixel features — now with a
    FULL value oracle: the fake decoder tiles the 16-byte md5 digest of
    doc_id into the plane with exactly equal multiplicity (see
    operators/multimodal.py:_blob_for / synth_media), so pix_mean /
    pix_std / hist4 are closed-form functions of md5(doc_id) that DuckDB
    recomputes bit-for-bit (mean and histogram bins are exact sixteenths;
    the variance arithmetic is exact in float64 on both engines, so the
    only float op is one identically-rounded sqrt).

    The driver canonicalizes results with a pandas sort over every column,
    which cannot hash ``array<float>`` cells; project ``hist4`` as a
    deterministic comma-joined string instead (the array-valued form stays
    under pytest in tests/test_multimodal.py)."""
    from pyspark.sql import functions as F

    feats = media_features(_media(spark, sf_dir))
    return feats.select(
        "doc_id",
        "kind",
        "pix_mean",
        "pix_std",
        F.concat_ws(
            ",", F.transform("hist4", lambda x: F.round(x.cast("double"), 4).cast("string"))
        ).alias("hist4_csv"),
    )


ORACLE_MULTIMODAL_FEATURES = """
with b as (
  select doc_id,
         case doc_id % 3 when 0 then 'image' when 1 then 'audio' else 'video' end as kind,
         md5(cast(doc_id as varchar)) as hx
  from documents
),
bytes as (
  select doc_id, kind, ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT as byte
  from b, lateral (select unnest(range(0, 16)) as j)
),
stats as (
  select doc_id, kind,
         cast(sum(byte) as bigint) / 16.0 as mean,
         cast(sum(case when byte // 64 = 0 then 1 else 0 end) as bigint) as c0,
         cast(sum(case when byte // 64 = 1 then 1 else 0 end) as bigint) as c1,
         cast(sum(case when byte // 64 = 2 then 1 else 0 end) as bigint) as c2,
         cast(sum(case when byte // 64 = 3 then 1 else 0 end) as bigint) as c3
  from bytes group by 1, 2
),
dev as (
  select s.doc_id, s.kind, s.mean, s.c0, s.c1, s.c2, s.c3,
         sum((y.byte - s.mean) * (y.byte - s.mean)) / 16.0 as var
  from stats s join bytes y using (doc_id)
  group by 1, 2, 3, 4, 5, 6, 7
)
select doc_id, kind,
       round(mean, 6) as pix_mean,
       round(sqrt(var), 6) as pix_std,
       concat_ws(',',
         cast(round(c0 / 16.0, 4) as varchar),
         cast(round(c1 / 16.0, 4) as varchar),
         cast(round(c2 / 16.0, 4) as varchar),
         cast(round(c3 / 16.0, 4) as varchar)) as hist4_csv
from dev
"""


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
}

ORACLES = {
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
}
