"""Multimodal binary-column plumbing (decode stubbed, SURVEY brief)."""

import pytest

from knovexlite_spark.ops.multimodal import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    sample_frames,
)


def _media(spark):
    rows = [
        (0, "image", bytearray(b"\x89PNG fake bytes 0"), {"w": "8"}),
        (1, "image", bytearray(b"\x89PNG fake bytes 1"), {"w": "8"}),
        (2, "video", bytearray(b"\x00\x00mp4 fake"), {"n_frames": "25"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(Exception) as ei:
        decode_and_featurize(_media(spark)).collect()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)


def test_fake_decode_deterministic_and_shaped(spark):
    a = decode_and_featurize(_media(spark), use_fake_decoder=True).collect()
    b = decode_and_featurize(_media(spark), use_fake_decoder=True).collect()
    fa = {r["media_id"]: r["feat"] for r in a}
    fb = {r["media_id"]: r["feat"] for r in b}
    assert fa == fb
    assert all(len(v) == 8 for v in fa.values())
    assert fa[0] != fa[1]  # content-keyed


def test_frame_sampling(spark):
    rows = sample_frames(_media(spark).filter("kind = 'video'"), every_n=10).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 10, 20]
