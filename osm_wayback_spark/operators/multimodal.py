"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema (schemas.MEDIA), Arrow batch shape,
partitioning, UDF signatures — is real and tested; the actual media
decode is STUBBED (no image/audio libraries in this container):

- ``decode_features`` produces a deterministic fake feature vector
  derived from the payload bytes (md5-seeded), so downstream joins /
  ANN over media embeddings are exercised end-to-end;
- ``decode_image`` raises NotImplementedError, marking exactly where
  a PIL/libvips kernel plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode goes here (PIL/turbojpeg). Stubbed: container has
    no imaging libraries."""
    raise NotImplementedError(
        "media decode requires an imaging library not present in this "
        "environment; use decode_features (deterministic stub) instead"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-feature kernel."""
    out = []
    for i in range(0, dim, 4):
        h = hashlib.md5(payload + i.to_bytes(2, "little")).digest()
        for j in range(min(4, dim - i)):
            v = int.from_bytes(h[j * 4 : j * 4 + 4], "little")
            out.append(round((v / 2**31) - 1.0, 6))
    return out


def decode_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """media(media_id, kind, payload, ...) → (media_id, kind,
    features array<float>) via an Arrow-batched kernel — the real
    plumbing a decode/resize/frame-sample op would use."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [
                        _fake_features(bytes(p) if p is not None else b"", dim)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        kernel, schema="media_id long, kind string, features array<float>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes (media_id, frame_ts_ms)
    rows for each sample instant from typed metadata — native column
    math; the per-frame decode would be a kernel like decode_features."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
