"""Multimodal binary-column pipeline: deterministic synthesis, stubbed
decode, feature extraction — verified against a pure-Python oracle."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from sliding_window_aggregators_spark.operators.multimodal import (
    _blob_for,
    _fake_decode,
    decode_image_batch,
    media_features,
    synth_media,
    thumbnail_dims,
)


def test_blob_deterministic():
    assert _blob_for(7, 64) == _blob_for(7, 64)
    assert _blob_for(7, 64) != _blob_for(8, 64)
    assert len(_blob_for(3, 1000)) == 1000


def test_fake_decode_shape_and_content():
    blob = _blob_for(5, 100)
    plane = _fake_decode(blob, 20, 10)
    assert plane.shape == (10, 20)
    # tiling: first 100 bytes are the blob itself
    assert plane.ravel()[:100].tobytes() == blob


def test_real_decode_is_stubbed():
    pdf = pd.DataFrame({"blob": [b"x"], "width": [1], "height": [1]})
    with pytest.raises(NotImplementedError):
        decode_image_batch(pdf, real=True)


def test_thumbnail_dims_int_math():
    tw, th = thumbnail_dims(np.array([512, 64, 100]), np.array([256, 64, 400]))
    assert tw.tolist() == [128, 128, 32]
    assert th.tolist() == [64, 128, 128]


def test_media_features_matches_python_oracle(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": range(30)}))
    media = synth_media(docs)
    feats = (
        media_features(media)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(feats) == 30
    for _, row in feats.iterrows():
        i = int(row.doc_id)
        kind = ["image", "audio", "video"][i % 3]
        w = 64 + 16 * ((i * 37) % 28)
        h = 64 + 16 * ((i * 53) % 28)
        assert row.kind == kind
        plane = _fake_decode(_blob_for(i, w * h // 16), w, h)
        assert row.pix_mean == pytest.approx(round(float(plane.mean()), 6))
        assert row.pix_std == pytest.approx(round(float(plane.std()), 6))
        hist = np.bincount(plane.ravel() >> 6, minlength=4) / plane.size
        assert np.allclose(np.asarray(row.hist4), hist.astype("float32"))
        if kind == "video":
            assert row.sampled_frames == (8 + i % 24 + 3) // 4
        if kind == "audio":
            assert row.audio_usec == (w * h // 16) * 1_000_000 // 16000


def test_media_metadata_matches_features_meta_columns(spark):
    """The decode-free metadata pass must agree with the full feature
    pass on every shared column."""
    from sliding_window_aggregators_spark.operators.multimodal import (
        media_features,
        media_metadata,
        synth_media,
    )

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    media = synth_media(docs)
    cols = ["doc_id", "kind", "thumb_w", "thumb_h", "sampled_frames", "audio_usec"]
    a = media_metadata(media).select(cols).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = media_features(media).select(cols).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
