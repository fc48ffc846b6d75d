"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; every
transform is an Arrow-batched ``mapInPandas`` op (never per-row Python).
The actual codec work (JPEG decode, audio resample, video demux) needs
libraries this container doesn't ship, so the decode step is STUBBED:

- ``decode_image(..., real=True)`` raises ``NotImplementedError`` with
  the exact integration point documented;
- the default path uses a *deterministic fake decoder* (pixels derived
  from the blob bytes by tiling) so the full pipeline — schema, shuffle
  behavior, UDF signatures, Arrow batch shapes, feature vectors — is real
  and testable end-to-end.

Synthesis: :func:`synth_media` derives deterministic blobs + metadata
from any id/text column (md5-chained bytes), so no external data is
needed at any scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, blob binary"
)


def _blob_for(key: int, nbytes: int) -> bytes:
    """Deterministic pseudo-media bytes: the 16-byte md5 digest of the
    key, tiled to length. One hashlib call + one vectorized tile per
    blob, and — because :func:`synth_media` makes width·height a
    multiple of 256 — the fake-decoded plane holds each digest byte with
    EXACTLY equal multiplicity, so every plane statistic (mean / std /
    4-bin histogram) is an exact closed-form function of md5(doc_id).
    That is what gives ``multimodal_features`` a FULL cross-engine value
    oracle (DuckDB recomputes the same stats from its own md5()) while
    the pipeline still moves real opaque binary through Arrow."""
    digest = np.frombuffer(hashlib.md5(str(key).encode()).digest(), dtype=np.uint8)
    reps = -(-nbytes // 16)
    return np.tile(digest, reps)[:nbytes].tobytes()


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic media blob + typed metadata to each row.

    kind cycles image/audio/video; dims/rates/frame-counts derive from the
    id. Runs as one mapInPandas pass (distributed synthesis, no driver
    materialization)."""
    src = df.select(id_col)

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            kinds = np.array(["image", "audio", "video"], dtype=object)[ids % 3]
            # dims are multiples of 16 (64..496) so width·height ≡ 0
            # mod 256: the blob length width·height/16 is then a multiple
            # of 16 AND divides the plane size, making the tiled plane an
            # exact equal-multiplicity repetition of the md5 digest bytes
            # (see _blob_for — the property the features oracle rests on)
            width = (64 + 16 * ((ids * 37) % 28)).astype("int32")
            height = (64 + 16 * ((ids * 53) % 28)).astype("int32")
            n_frames = np.where(kinds == "video", 8 + (ids % 24), 1).astype("int32")
            sample_rate = np.where(kinds == "audio", 16000, 0).astype("int32")
            blobs = [
                _blob_for(int(i), int(w) * int(h) // 16) for i, w, h in zip(ids, width, height)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": kinds,
                    "width": width,
                    "height": height,
                    "n_frames": n_frames,
                    "sample_rate": sample_rate,
                    "blob": blobs,
                }
            )

    return src.mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode / feature-extract / resize / frame-sample
# ---------------------------------------------------------------------------


def _fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: tile the blob bytes
    into a (height, width) uint8 luminance plane."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    need = width * height
    if len(raw) == 0:  # empty blob → zero plane (tiling nothing can't fill)
        return np.zeros((height, width), dtype=np.uint8)
    reps = -(-need // len(raw))
    return np.tile(raw, reps)[:need].reshape(height, width)


def decode_image_batch(pdf: pd.DataFrame, real: bool = False) -> list[np.ndarray]:
    if real:
        raise NotImplementedError(
            "real decode requires an image codec (e.g. pillow/opencv), not "
            "shipped in this container; plug it in here — the surrounding "
            "Arrow plumbing (binary in, ndarray per row out) is final"
        )
    return [
        _fake_decode(b, int(w), int(h))
        for b, w, h in zip(pdf["blob"], pdf["width"], pdf["height"])
    ]


def thumbnail_dims(width: np.ndarray, height: np.ndarray, max_side: int = 128):
    """Integer 'fit into max_side×max_side preserving aspect' — pure int
    math so a SQL oracle reproduces it exactly: scale the longer side to
    max_side, the shorter by floor(short·max_side/long), min 1."""
    width = width.astype(np.int64)
    height = height.astype(np.int64)
    long_side = np.maximum(width, height)
    tw = np.maximum((width * max_side) // long_side, 1).astype("int32")
    th = np.maximum((height * max_side) // long_side, 1).astype("int32")
    return tw, th


def _meta_columns(pdf: pd.DataFrame, max_side: int) -> dict:
    """The metadata derivations both media passes share: thumbnail fit,
    sampled-frame count, audio duration (integer math only)."""
    tw, th = thumbnail_dims(pdf["width"].to_numpy(), pdf["height"].to_numpy(), max_side)
    n_frames = pdf["n_frames"].to_numpy()
    sampled = np.where(
        pdf["kind"].to_numpy() == "video", (n_frames + 3) // 4, 0
    ).astype("int32")
    blob_bytes = np.array([len(b) for b in pdf["blob"]], dtype=np.int64)
    duration_us = np.where(
        pdf["kind"].to_numpy() == "audio",
        (blob_bytes * 1_000_000) // np.maximum(pdf["sample_rate"].to_numpy(), 1),
        0,
    ).astype("int64")
    return {"thumb_w": tw, "thumb_h": th, "sampled_frames": sampled,
            "audio_usec": duration_us}


def media_metadata(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Metadata-only pass: thumbnail fit, frame sampling, audio duration —
    everything :func:`media_features` derives WITHOUT touching pixel data
    (the production shape: container headers/EXIF are bytes-cheap; pixel
    decode is the expensive stage you run only when features are asked
    for). Same output columns as the meta projection of media_features;
    one mapInPandas pass that reads blob LENGTHS but never decodes."""

    def gen(batches):
        for pdf in batches:
            meta = _meta_columns(pdf, max_side)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "kind": pdf["kind"], **meta})

    return media.mapInPandas(
        gen,
        "doc_id long, kind string, thumb_w int, thumb_h int, "
        "sampled_frames int, audio_usec long",
    )


def _plane_stats_batch(blobs, widths, heights):
    """mean / std / 4-bin histogram of each row's (fake-)decoded plane,
    computed WITHOUT materializing the planes whenever the plane is an
    exact whole-number tiling of the blob (the decoder tiles the blob to
    width·height; when width·height % len(blob) == 0 the plane is the
    blob repeated k times, and mean, population std and histogram
    PROPORTIONS are tiling-invariant: sums scale by k, lengths scale by
    k, and both divisions are correctly-rounded quotients of the same
    real value). The non-divisible general case falls back to the tiled
    plane. All rows of the batch are then reduced in one vectorized pass
    (np.add.reduceat over the concatenated bytes) instead of one small
    numpy call per row — ~16× less memory traffic and no per-row Python
    in the hot path."""
    n = len(blobs)
    if n == 0:
        z = np.empty(0, dtype=np.float64)
        return z, z, []
    raws = []
    lens = np.empty(n, dtype=np.int64)
    for i, (b, w, h) in enumerate(zip(blobs, widths, heights)):
        raw = np.frombuffer(b, dtype=np.uint8)
        need = int(w) * int(h)
        if len(raw) == 0:  # empty blob → zero plane (decoder contract)
            raw = np.zeros(need, dtype=np.uint8)
        elif need % len(raw) != 0:
            reps = -(-need // len(raw))
            raw = np.tile(raw, reps)[:need]
        raws.append(raw)
        lens[i] = len(raw)
    cat = np.concatenate(raws)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    fl = lens.astype(np.float64)
    sums = np.add.reduceat(cat.astype(np.int64), starts)
    mean = sums / fl
    dev = cat.astype(np.float64)
    dev -= np.repeat(mean, lens)
    dev *= dev
    var = np.add.reduceat(dev, starts) / fl
    std = np.sqrt(var)
    bins = (cat >> 6).astype(np.int64) + 4 * np.repeat(
        np.arange(n, dtype=np.int64), lens
    )
    counts = np.bincount(bins, minlength=4 * n).reshape(n, 4)
    hist = list((counts / fl[:, None]).astype("float32"))
    return mean, std, hist


def media_features(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Decode (stub) → resize dims → per-media features, one mapInPandas
    pass: mean/std of the decoded plane, a 4-bin histogram feature vector,
    sampled-frame count for video (every 4th frame), duration for audio."""

    def gen(batches):
        for pdf in batches:
            mean, std, hist = _plane_stats_batch(
                pdf["blob"], pdf["width"], pdf["height"]
            )
            meta = _meta_columns(pdf, max_side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "thumb_w": meta["thumb_w"],
                    "thumb_h": meta["thumb_h"],
                    "pix_mean": np.round(mean, 6),
                    "pix_std": np.round(std, 6),
                    "hist4": hist,
                    "sampled_frames": meta["sampled_frames"],
                    "audio_usec": meta["audio_usec"],
                }
            )

    return media.mapInPandas(
        gen,
        "doc_id long, kind string, thumb_w int, thumb_h int, pix_mean double, "
        "pix_std double, hist4 array<float>, sampled_frames int, audio_usec long",
    )
