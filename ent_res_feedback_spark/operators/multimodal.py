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
