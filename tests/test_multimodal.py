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


def test_decode_real_requires_codec(spark):
    """decoder='real' must fail loudly when Pillow is missing (never a
    silent fake fallback); 'auto' degrades to the fake decoder."""
    from knovexlite_spark.ops.multimodal import real_image_codec_available

    if real_image_codec_available():
        pytest.skip("Pillow installed; the real path is tested elsewhere")
    with pytest.raises(Exception) as ei:
        decode_and_featurize(_media(spark), decoder="real").collect()
    assert "Pillow" in str(ei.value)
    assert decode_and_featurize(_media(spark)).count() == _media(spark).count()


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


def test_sample_frames_zero_frame_media_emit_nothing(spark):
    """Zero-frame or missing-metadata media must produce NO sampled
    frames (used to emit frame 0 — round-1 advisor finding)."""
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(b"x"), {"n_frames": "0"}),
            (2, "video", bytearray(b"y"), {}),
            (3, "video", bytearray(b"z"), {"n_frames": "25"}),
        ],
        schema="media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = sample_frames(media, every_n=10).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in rows) == [
        (3, 0), (3, 10), (3, 20),
    ]


def test_decoder_seam_fake_and_auto(spark):
    """decoder='fake' and (in this codec-less container) decoder='auto'
    both run the deterministic stub; decoder='real' raises a clear error
    when Pillow is absent."""
    import pytest

    from knovexlite_spark.ops.multimodal import (
        decode_and_featurize,
        real_image_codec_available,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"payload"), {"w": "8"})],
        schema="media_id long, kind string, payload binary, meta map<string,string>",
    )
    fake = decode_and_featurize(media, decoder="fake").collect()
    auto = decode_and_featurize(media, decoder="auto").collect()
    assert len(fake) == len(auto) == 1
    if not real_image_codec_available():
        assert fake[0]["feat"] == auto[0]["feat"]
        with pytest.raises(Exception, match="Pillow"):
            decode_and_featurize(media, decoder="real").collect()


def test_decoder_real_path_with_pillow(spark):
    """Exercises the REAL codec path; runs only where Pillow exists."""
    import pytest

    from knovexlite_spark.ops.multimodal import (
        decode_and_featurize,
        real_image_codec_available,
    )

    if not real_image_codec_available():
        pytest.skip("Pillow not installed in this container")
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), {})],
        schema="media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = decode_and_featurize(media, decoder="real", width=8, height=8).collect()[0]
    assert row["width"] == 8 and row["height"] == 8
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in row["feat"])
