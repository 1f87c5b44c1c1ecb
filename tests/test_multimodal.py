"""Multimodal binary-column plumbing + built-in real decode.

The PPM/BMP decoders are pure-Python, so the REAL pixel path runs in
this dependency-free environment (no skips); where Pillow happens to
be installed, decode_image must agree with it byte-for-byte.
"""

import struct

import numpy as np
import pytest

from osm_wayback_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    decode_image,
    frame_sample_plan,
)
from osm_wayback_spark.schemas import MEDIA


def ppm6(w, h, pixels, maxval=255, comment=False):
    """Encode (H, W, 3) uint8 → binary P6 bytes (independent of the
    decoder under test)."""
    hdr = b"P6\n"
    if comment:
        hdr += b"# a comment line\n"
    hdr += f"{w} {h}\n{maxval}\n".encode()
    return hdr + np.asarray(pixels, dtype=np.uint8).tobytes()


def ppm3(w, h, pixels, maxval=255):
    body = " ".join(str(int(v)) for v in np.asarray(pixels).reshape(-1))
    return f"P3\n{w} {h} {maxval}\n{body}\n".encode()


def bmp24(pixels):
    """Encode (H, W, 3) RGB uint8 → uncompressed bottom-up 24-bit BMP
    bytes (BGR rows, 4-byte padded) — the standard layout."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    off = 54
    size = off + len(rows)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + dib + rows


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake", "image/png", 64, 64, None),
        (2, "video", b"\x00\x00vid", "video/mp4", 320, 240, 3500),
        (3, "audio", None, "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_decode_image_ppm_binary_and_ascii():
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    assert (decode_image(ppm6(4, 3, px)) == px).all()
    assert (decode_image(ppm6(4, 3, px, comment=True)) == px).all()
    assert (decode_image(ppm3(4, 3, px)) == px).all()
    # maxval scaling: maxval=100 → full scale maps to 255, half to ~127
    half = np.full((2, 2, 3), 50, dtype=np.uint8)
    half[0, 0] = [100, 0, 100]
    out = decode_image(ppm6(2, 2, half, maxval=100))
    assert list(out[0, 0]) == [255, 0, 255]
    assert abs(int(out[1, 1, 0]) - 127.5) <= 0.5
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 3\n255\n\x00\x01")  # truncated pixels


def test_decode_image_bmp():
    px = np.zeros((3, 3, 3), dtype=np.uint8)
    px[0, 0] = [255, 0, 0]   # top-left red
    px[2, 2] = [0, 0, 255]   # bottom-right blue
    out = decode_image(bmp24(px))
    assert out.shape == (3, 3, 3)
    assert (out == px).all()  # row order + BGR→RGB + padding all undone
    with pytest.raises(NotImplementedError):
        # 8-bit BMP is not built in
        bad = bytearray(bmp24(px))
        struct.pack_into("<H", bad, 28, 8)
        decode_image(bytes(bad))


def test_decode_image_unknown_format_raises():
    from osm_wayback_spark.operators.multimodal import _pil

    if _pil() is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG not really decodable")
    else:
        # Pillow path must agree with the built-in decoders
        px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
        assert (decode_image(ppm6(4, 3, px)) == px).all()
        assert (decode_image(bmp24(px)) == px).all()


def test_pixel_features_real_decode(spark):
    """The real=True feature kernel end-to-end over PPM payloads
    through the Arrow plumbing — always runs, no imaging library."""
    white = ppm6(8, 8, np.full((8, 8, 3), 255, dtype=np.uint8))
    black = ppm6(8, 8, np.zeros((8, 8, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, "image", white, "image/x-portable-pixmap", 8, 8, None),
         (2, "image", black, "image/x-portable-pixmap", 8, 8, None)],
        MEDIA,
    )
    feats = {
        r.media_id: list(r.features)
        for r in decode_features(df, real=True).collect()
    }
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert all(abs(f - 1.0) < 0.01 for f in feats[1])   # white
    assert all(abs(f + 1.0) < 0.01 for f in feats[2])   # black


def test_pixel_features_mixed_formats_agree(spark):
    """The SAME image as PPM and BMP must produce identical feature
    vectors through the distributed kernel."""
    px = (np.indices((6, 6)).sum(axis=0) * 20).astype(np.uint8)
    rgb = np.stack([px, px, px], axis=-1)
    df = spark.createDataFrame(
        [(1, "image", ppm6(6, 6, rgb), "image/x-portable-pixmap", 6, 6, None),
         (2, "image", bmp24(rgb), "image/bmp", 6, 6, None)],
        MEDIA,
    )
    feats = {
        r.media_id: list(r.features)
        for r in decode_features(df, real=True).collect()
    }
    assert feats[1] == feats[2]


def wav16(frames, rate=8000, extra_chunk=True):
    """Encode (n, channels) int16 → PCM WAV bytes via the stdlib-free
    spec layout (independent of the decoder under test); optionally
    inserts an odd-sized junk chunk before data to exercise the
    chunk walk + word alignment."""
    arr = np.asarray(frames, dtype=np.int16)
    n, ch = arr.shape
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 3) + b"odd" + b"\x00"  # pad
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_audio_pcm_wav():
    from osm_wayback_spark.operators.multimodal import decode_audio

    t = np.arange(64)
    left = (np.sin(t / 3.0) * 16384).astype(np.int16)
    right = np.zeros(64, dtype=np.int16)
    x, rate = decode_audio(wav16(np.stack([left, right], axis=1), rate=4000))
    assert rate == 4000 and x.shape == (64, 2)
    assert np.allclose(x[:, 0], left / 32768.0)
    assert (x[:, 1] == 0).all()
    # chunk walk without the junk chunk too
    x2, _ = decode_audio(
        wav16(np.stack([left, right], axis=1), extra_chunk=False)
    )
    assert np.allclose(x, x2)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00not audio at all")
    # compressed formats are a clean NotImplementedError
    bad = bytearray(wav16(np.zeros((4, 1), dtype=np.int16)))
    struct.pack_into("<H", bad, bad.index(b"fmt ") + 8, 7)  # mu-law
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(bad))


def test_audio_features_rms(spark):
    """Real audio features end-to-end through the Arrow kernel: a
    loud half followed by a silent half shows up as high-then-zero
    RMS buckets."""
    from osm_wayback_spark.operators.multimodal import audio_features

    loud = np.full(512, 16384, dtype=np.int16)
    silent = np.zeros(512, dtype=np.int16)
    wav = wav16(np.concatenate([loud, silent]).reshape(-1, 1))
    df = spark.createDataFrame(
        [(7, "audio", wav, "audio/wav", None, None, 128),
         (8, "image", b"not audio", "image/png", 2, 2, None)],
        MEDIA,
    )
    rows = audio_features(df, dim=4).collect()
    assert [r.media_id for r in rows] == [7]  # non-audio rows filtered
    f = list(rows[0].features)
    assert len(f) == 4
    assert f[0] == f[1] == pytest.approx(0.5, abs=1e-6)
    assert f[2] == f[3] == 0.0


def test_decode_features_deterministic(media):
    a = {r.media_id: list(r.features) for r in decode_features(media).collect()}
    b = {r.media_id: list(r.features) for r in decode_features(media.repartition(3)).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert a[1] != a[2]


def test_frame_sample_plan(media):
    rows = frame_sample_plan(media, every_ms=1000).collect()
    got = sorted(r.frame_ts_ms for r in rows)
    assert got == [0, 1000, 2000, 3000]  # video of 3500 ms only
