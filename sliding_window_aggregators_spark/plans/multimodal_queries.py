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


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synth_media(docs)


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
         64 + (doc_id * 37) % 448 as width,
         64 + (doc_id * 53) % 448 as height,
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
    """Full pipeline incl. (stub-)decoded pixel features — rows-only.

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


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
}

ORACLES = {
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    # multimodal_features: rows-only (pixel plane from binary blobs)
}
