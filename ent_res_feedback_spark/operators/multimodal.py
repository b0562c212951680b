"""Multimodal column plumbing: images/audio/video as opaque ``binary``
payloads with typed metadata, processed via Arrow-batched mapInPandas.

The decode/feature-extract kernels are STUBBED (this container has no
image/audio libraries) behind ``DecodeUnavailable`` or a deterministic
fake — but the Spark-side plumbing is real and tested: schema, batch
iteration shape, partition sizing, and the metadata passthrough
contract. Swapping a real decoder in changes ONE function.

Schema convention:
    media(media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, duration_ms:int, codec:string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,codec:string>"
)

FEATURE_DIM = 16


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decoder slot when no codec library is present."""


def _decode_image_real(payload: bytes, meta) -> np.ndarray:  # pragma: no cover
    raise DecodeUnavailable(
        "image decoding requires PIL/opencv — not available in this "
        "container; use deterministic_fake_features for plumbing tests"
    )


def deterministic_fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector derived from the payload hash
    — keeps every test reproducible and the plumbing end-to-end real."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_media_features(
    media: DataFrame,
    feature_fn=deterministic_fake_features,
    dim: int = FEATURE_DIM,
    batch_hint: int | None = None,
) -> DataFrame:
    """media -> (media_ref, kind, features array<float>) via mapInPandas.

    The kernel sees Arrow batches; payloads are bytes. Batch shape and
    metadata passthrough are the real contract; the feature function is
    the swappable slot (real decoder vs deterministic fake).
    """
    out_schema = "media_ref string, kind string, features array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                None if p is None else feature_fn(bytes(p), dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    cols = media.select("media_ref", "kind", "payload")
    return cols.mapInPandas(kernel, out_schema)


def features_long(feats: DataFrame) -> DataFrame:
    """(media_ref, kind, features array<float>) -> long form
    (media_ref, kind, dim_idx, value double). Canonicalizable (no list
    columns) — the shape driver-side checks and parquet sinks want."""
    return feats.select(
        "media_ref",
        "kind",
        F.posexplode("features").alias("dim_idx", "value"),
    ).select(
        "media_ref",
        "kind",
        F.col("dim_idx").cast("bigint").alias("dim_idx"),
        F.round(F.col("value").cast("double"), 6).alias("value"),
    )


def media_from_table(
    rows: DataFrame, ref_col: str = "media_ref", kind: str = "image"
) -> DataFrame:
    """Any table with a media-reference column -> the media schema, with a
    deterministic payload derived from the ref (stand-in for the object-
    store fetch a production pipeline does by media_ref)."""
    return rows.select(
        F.col(ref_col).alias("media_ref"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(ref_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def media_from_spans(docs: DataFrame) -> DataFrame:
    """Explode the documents table's media spans into a media table with a
    deterministic fake payload per ref (the payload is opaque by contract;
    a real pipeline reads it from an object store by media_ref)."""
    spans = docs.select(
        F.col("doc_id"), F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "media")
    return spans.select(
        F.col("s.media_ref").alias("media_ref"),
        F.lit("image").alias("kind"),
        F.encode(F.col("s.media_ref"), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def deterministic_fake_image(payload: bytes, height: int, width: int) -> np.ndarray:
    """Deterministic decoded-image stand-in: hash-seeded float32 HxW array
    in [0,1). Swap slot for ``_decode_image_real``; everything downstream
    (resize, feature extraction) is REAL math over this array."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((height, width), dtype=np.float32)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real bilinear resize (pixel-center sampling, the OpenCV/PIL
    align_corners=False convention) in pure numpy — no image library."""
    h, w = img.shape
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * w / out_w - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    fy, fx = ys - y0f, xs - x0f
    y0 = np.clip(y0f.astype(int), 0, h - 1)
    y1 = np.clip(y0f.astype(int) + 1, 0, h - 1)
    x0 = np.clip(x0f.astype(int), 0, w - 1)
    x1 = np.clip(x0f.astype(int) + 1, 0, w - 1)
    fy = fy[:, None]
    fx = fx[None, :]
    a = img[np.ix_(y0, x0)].astype(np.float64)
    b = img[np.ix_(y1, x0)].astype(np.float64)
    c = img[np.ix_(y0, x1)].astype(np.float64)
    d = img[np.ix_(y1, x1)].astype(np.float64)
    out = a * (1 - fy) * (1 - fx) + b * fy * (1 - fx) + c * (1 - fy) * fx + d * fy * fx
    return out.astype(np.float32)


def resize_media(
    media: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    decode_fn=deterministic_fake_image,
) -> DataFrame:
    """media -> (media_ref, kind, out_h, out_w, pixels array<float>)
    via mapInPandas: decode (swappable slot) -> REAL bilinear resize ->
    row-major flattened pixels. The Arrow batch shape, meta passthrough
    (source dims come from ``meta``), and output schema are the production
    contract; only the decoder is a stand-in."""
    out_schema = (
        "media_ref string, kind string, out_h int, out_w int, "
        "pixels array<float>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pixels = []
            for ref, p, m in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                if p is None:
                    pixels.append(None)
                    continue
                h = int(m["height"]) if m is not None and m["height"] is not None else 64
                w = int(m["width"]) if m is not None and m["width"] is not None else 64
                if h <= 0 or w <= 0:
                    raise ValueError(
                        f"non-positive media dimensions {h}x{w} for "
                        f"media_ref={ref!r} — malformed meta"
                    )
                img = decode_fn(bytes(p), h, w)
                pixels.append(resize_bilinear(img, out_h, out_w).ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "out_h": out_h,
                    "out_w": out_w,
                    "pixels": pixels,
                }
            )

    return media.select("media_ref", "kind", "payload", "meta").mapInPandas(
        kernel, out_schema
    )


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    feature_fn=deterministic_fake_features,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Video frame sampling: for each media row with a duration, emit
    ``n_frames`` evenly spaced frames (pixel-center convention:
    ts_i = (i + 0.5) * duration / n) with per-frame features.

    -> (media_ref, frame_idx, ts_ms, frame_features array<float>).
    Frame DECODE is the stand-in slot (features derive deterministically
    from payload + frame index); the explode shape, timestamp math, and
    schema are the production contract."""
    out_schema = (
        "media_ref string, frame_idx int, ts_ms bigint, "
        "frame_features array<float>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            refs, idxs, tss, feats = [], [], [], []
            for ref, p, m in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                if p is None or m is None or m["duration_ms"] is None:
                    continue
                dur = int(m["duration_ms"])
                for i in range(n_frames):
                    refs.append(ref)
                    idxs.append(i)
                    tss.append(int((i + 0.5) * dur / n_frames))
                    feats.append(
                        feature_fn(bytes(p) + i.to_bytes(4, "big"), dim).tolist()
                    )
            if not refs:  # all-image batch: empty object columns won't
                continue  # round-trip through Arrow's list<float> writer
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int64"),
                    "frame_features": feats,
                }
            )

    return media.select("media_ref", "payload", "meta").mapInPandas(
        kernel, out_schema
    )
