"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema (schemas.MEDIA), Arrow batch shape,
partitioning, UDF signatures — is real and tested; the actual media
decode probes for Pillow at call time:

- ``decode_image`` decodes with PIL when it's importable (the real
  code path, tested when the optional dependency is present) and
  raises NotImplementedError otherwise, marking exactly where a
  libvips/turbojpeg kernel plugs in;
- ``decode_features`` produces a deterministic fake feature vector
  derived from the payload bytes (md5-seeded), so downstream joins /
  ANN over media embeddings are exercised end-to-end even without an
  imaging library. Pass ``use_pil=True`` to swap in mean-pooled
  pixel features from the real decode.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def _pil():
    """Probe for the optional Pillow dependency (None when absent)."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    return Image


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload → (H, W, C) uint8 array. Uses Pillow
    when installed (the real path); otherwise raises — the
    deterministic ``decode_features`` stub keeps downstream plumbing
    exercised in imaging-library-free environments."""
    image_mod = _pil()
    if image_mod is None:
        raise NotImplementedError(
            "media decode requires an imaging library not present in "
            "this environment; use decode_features (deterministic "
            "stub) instead"
        )
    with image_mod.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"))


def _pixel_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real feature kernel (requires Pillow): mean-pooled grayscale
    over a dim-bucket grid, normalized to [-1, 1]."""
    arr = decode_image(payload).mean(axis=2)  # grayscale
    h, w = arr.shape
    cells = np.array_split(arr.reshape(h * w), dim)
    return [round(float(c.mean()) / 127.5 - 1.0, 6) if c.size else 0.0 for c in cells]


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-feature kernel."""
    out = []
    for i in range(0, dim, 4):
        h = hashlib.md5(payload + i.to_bytes(2, "little")).digest()
        for j in range(min(4, dim - i)):
            v = int.from_bytes(h[j * 4 : j * 4 + 4], "little")
            out.append(round((v / 2**31) - 1.0, 6))
    return out


def decode_features(
    media: DataFrame, dim: int = FEATURE_DIM, use_pil: bool = False
) -> DataFrame:
    """media(media_id, kind, payload, ...) → (media_id, kind,
    features array<float>) via an Arrow-batched kernel — the real
    plumbing a decode/resize/frame-sample op would use. With
    ``use_pil`` the features are mean-pooled pixels from the real
    Pillow decode (raises where Pillow is absent); default is the
    deterministic md5 stub."""
    extract = _pixel_features if use_pil else _fake_features

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [
                        extract(bytes(p) if p is not None else b"", dim)
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
