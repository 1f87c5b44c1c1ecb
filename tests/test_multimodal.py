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


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")


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
