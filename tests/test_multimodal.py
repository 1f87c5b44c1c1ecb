"""Multimodal binary-column plumbing (decode stubbed)."""

import pytest

from osm_wayback_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    decode_image,
    frame_sample_plan,
)
from osm_wayback_spark.schemas import MEDIA


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake", "image/png", 64, 64, None),
        (2, "video", b"\x00\x00vid", "video/mp4", 320, 240, 3500),
        (3, "audio", None, "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA)


def test_decode_image_probe():
    """decode_image is the REAL path when Pillow is installed and a
    clean NotImplementedError otherwise (environmental stub)."""
    from osm_wayback_spark.operators.multimodal import _pil

    if _pil() is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"anything")
    else:
        import io

        img = _pil().new("RGB", (4, 3), (10, 20, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        arr = decode_image(buf.getvalue())
        assert arr.shape == (3, 4, 3)
        assert (arr == [10, 20, 30]).all()


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="Pillow not installed",
)
def test_pixel_features_real_decode(spark):
    """The use_pil feature kernel end-to-end over real PNG payloads
    (runs only where the optional Pillow dependency is present)."""
    import io

    from osm_wayback_spark.operators.multimodal import _pil
    from osm_wayback_spark.schemas import MEDIA

    def png(gray):
        img = _pil().new("L", (8, 8), gray)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, "image", png(255), "image/png", 8, 8, None),
         (2, "image", png(0), "image/png", 8, 8, None)],
        MEDIA,
    )
    feats = {
        r.media_id: list(r.features)
        for r in decode_features(df, use_pil=True).collect()
    }
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert all(abs(f - 1.0) < 0.01 for f in feats[1])   # white
    assert all(abs(f + 1.0) < 0.01 for f in feats[2])   # black


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
