"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema (schemas.MEDIA), Arrow batch shape,
partitioning, UDF signatures — is real and tested, and so is the
decode for the formats a dependency-free environment can carry:

- ``decode_image`` decodes PPM (P6 binary / P3 ascii) and
  uncompressed 24-bit BMP with the pure-Python/numpy parsers below —
  always available, no imaging library — and uses Pillow when it IS
  importable (which additionally covers PNG/JPEG/...). Formats
  neither path handles raise NotImplementedError, marking exactly
  where a libvips/turbojpeg kernel plugs in.
- ``decode_features(real=True)`` runs the real pixel kernel
  (mean-pooled grayscale) through the Arrow plumbing; the default is
  a deterministic md5-seeded fake so downstream joins / ANN over
  media embeddings are exercised even on payloads of undecodable
  formats.
"""

from __future__ import annotations

import hashlib
import io
import struct
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


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-Python netpbm decode: P6 (binary) and P3 (ascii) → (H, W,
    3) uint8. Header per the public spec: magic, then width/height/
    maxval as whitespace-separated tokens with '#' comments allowed,
    then exactly one whitespace byte before P6 pixel data."""
    magic = payload[:2]
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM geometry {w}x{h} maxval={maxval}")
    if magic == b"P6":
        pos += 1  # the single whitespace byte after maxval
        px = np.frombuffer(
            payload, dtype=np.uint8, count=min(w * h * 3, len(payload) - pos),
            offset=pos,
        )
    else:  # P3
        px = np.array(
            [int(t) for t in payload[pos:].split()[: w * h * 3]],
            dtype=np.uint8,
        )
    if px.size != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    if maxval != 255:
        px = (px.astype(np.float64) * (255.0 / maxval)).round().astype(np.uint8)
    return px.reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-Python BMP decode: uncompressed (BI_RGB) 24-bit only →
    (H, W, 3) uint8. Rows are 4-byte padded, stored BGR, bottom-up
    when the header height is positive (the common form)."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is built in (got bpp={bpp}, "
            f"compression={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP geometry {w}x{h}")
    stride = (w * 3 + 3) & ~3
    if len(payload) < off + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """Pure-Python RIFF/WAVE decode: uncompressed PCM (format 1,
    8/16/32-bit int) → ((n_frames, channels) float64 in [-1, 1],
    sample_rate). Chunk-walks the RIFF container per the public spec
    (fmt then data; other chunks skipped, word-aligned). Compressed
    formats raise, marking where a codec kernel plugs in."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "payload is not RIFF/WAVE; built-in audio decode covers "
            "uncompressed PCM WAV only"
        )
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, body)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            audio_format, channels, rate, _, _, bits = fmt
            if audio_format != 1 or bits not in (8, 16, 32):
                raise NotImplementedError(
                    f"only uncompressed {8, 16, 32}-bit PCM is built in "
                    f"(got format={audio_format}, bits={bits})"
                )
            if channels <= 0:
                raise ValueError("WAV with zero channels")
            dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
            n = min(size, len(payload) - body) // (bits // 8)
            n -= n % channels
            raw = np.frombuffer(payload, dtype=dtype, count=n, offset=body)
            x = raw.astype(np.float64)
            if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
                x = (x - 128.0) / 128.0
            else:
                x = x / float(2 ** (bits - 1))
            return x.reshape(-1, channels), rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV without a data chunk")


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload → (H, W, C) uint8 array. Pillow when
    installed (covers PNG/JPEG/...); the built-in pure-Python PPM/BMP
    decoders otherwise — so the real-decode path executes in
    dependency-free environments too. Anything else raises, marking
    where a native decode kernel plugs in."""
    image_mod = _pil()
    if image_mod is not None:
        with image_mod.open(io.BytesIO(payload)) as img:
            return np.asarray(img.convert("RGB"))
    if payload[:2] in (b"P6", b"P3"):
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "payload format requires an imaging library not present in this "
        "environment (built-in decoders cover PPM P6/P3 and 24-bit BMP); "
        "use decode_features (deterministic stub) instead"
    )


def _pixel_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real feature kernel: mean-pooled grayscale over a dim-bucket
    grid, normalized to [-1, 1]."""
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
    media: DataFrame, dim: int = FEATURE_DIM, real: bool = False
) -> DataFrame:
    """media(media_id, kind, payload, ...) → (media_id, kind,
    features array<float>) via an Arrow-batched kernel — the real
    plumbing a decode/resize/frame-sample op would use. With ``real``
    the features are mean-pooled pixels from ``decode_image`` (Pillow
    or the built-in PPM/BMP decoders; raises on formats neither
    handles); default is the deterministic md5 stub, which accepts
    any payload."""
    extract = _pixel_features if real else _fake_features

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


def _rms_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio feature kernel: per-bucket RMS energy over the
    mono mix, ``dim`` equal time buckets."""
    x, _rate = decode_audio(payload)
    mono = x.mean(axis=1)
    cells = np.array_split(mono, dim)
    return [
        round(float(np.sqrt((c * c).mean())), 6) if c.size else 0.0
        for c in cells
    ]


def audio_features(
    media: DataFrame, dim: int = FEATURE_DIM, real: bool = True
) -> DataFrame:
    """media(media_id, kind, payload, ...) → (media_id, kind,
    features array<float>) for audio rows: per-bucket RMS energy
    from the built-in PCM WAV decode (``real=False`` falls back to
    the deterministic md5 stub for undecodable payloads). Same
    Arrow-batched mapInPandas plumbing as decode_features.

    A corrupt/non-RIFF payload on a kind='audio' row no longer fails
    the whole job (r6 advice): the real path catches the decoder's
    NotImplementedError/ValueError PER ROW and emits the md5 stub for
    that row — mirroring decode_features' accept-anything default."""
    if real:
        def extract(p: bytes, d: int):
            try:
                return _rms_features(p, d)
            except (NotImplementedError, ValueError):
                return _fake_features(p, d)
    else:
        extract = _fake_features

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

    return media.filter(F.col("kind") == "audio").mapInPandas(
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
