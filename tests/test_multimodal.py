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


def _pgm_bytes(pixels) -> bytes:
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def test_builtin_pgm_decode_real_format(spark):
    """The dependency-free REAL image path: binary-PGM payloads decoded
    by the pure-NumPy parser inside the Spark kernel, features equal to
    exact byte arithmetic.  Executes in this codec-less container —
    no Pillow involved."""
    import numpy as np

    rng = np.random.default_rng(7)
    imgs = {i: rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for i in range(3)}
    media = spark.createDataFrame(
        [(i, "image", bytearray(_pgm_bytes(px)), {}) for i, px in imgs.items()],
        schema=MEDIA_SCHEMA,
    )
    rows = decode_and_featurize(media, decoder="builtin").collect()
    assert len(rows) == 3
    for r in rows:
        want = imgs[r["media_id"]].mean(axis=1) / 255.0
        assert r["width"] == 8 and r["height"] == 8
        np.testing.assert_allclose(r["feat"], want.astype(np.float32), rtol=1e-6)


def test_builtin_pgm_block_mean_resize_and_comments(spark):
    """16x16 PGM (with a header comment) block-mean-resized to 8x8 in
    the kernel; indivisible targets raise."""
    import numpy as np

    from knovexlite_spark.ops.multimodal import _block_mean_resize, decode_pgm

    px = np.arange(256, dtype=np.uint8).reshape(16, 16)
    payload = b"P5\n# a comment\n16 16\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_pgm(payload), px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), {})], schema=MEDIA_SCHEMA
    )
    row = decode_and_featurize(media, decoder="builtin", width=8, height=8).collect()[0]
    want = (
        px.reshape(8, 2, 8, 2).mean(axis=(1, 3)).astype(np.uint8).mean(axis=1) / 255.0
    )
    np.testing.assert_allclose(row["feat"], want.astype(np.float32), rtol=1e-6)
    with pytest.raises(NotImplementedError, match="divisible"):
        _block_mean_resize(px, 7, 7)


def test_builtin_pgm_rejects_non_pgm(spark):
    with pytest.raises(Exception, match="P5 magic"):
        decode_and_featurize(_media(spark), decoder="builtin").collect()


def test_png_roundtrip_every_filter():
    """decode(encode(img)) == img for each fixed scanline filter 0-4 AND
    the cycling mode — a reconstruction bug in any filter (Sub/Up/
    Average/Paeth byte arithmetic) breaks exact equality."""
    import numpy as np

    from knovexlite_spark.ops.multimodal import decode_png, png_payload

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    for filt in [0, 1, 2, 3, 4, "cycle"]:
        got = decode_png(png_payload(img, filters=filt))
        np.testing.assert_array_equal(got, img, err_msg=f"filter={filt}")


def test_png_rgb_reduces_to_integer_luma():
    import numpy as np

    from knovexlite_spark.ops.multimodal import decode_png, png_payload

    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    got = decode_png(png_payload(rgb, filters="cycle"))
    r, g, b = (rgb[:, :, i].astype(np.int64) for i in range(3))
    want = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_png_compression_is_real():
    """The payload really is zlib-compressed (a compressible image
    encodes smaller than its raw bytes), and corrupt/unsupported inputs
    fail loudly rather than decode garbage."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from knovexlite_spark.ops.multimodal import decode_png, png_payload

    flat = np.zeros((64, 64), dtype=np.uint8)
    payload = png_payload(flat, filters=0)
    assert len(payload) < flat.size // 4  # 4096 raw bytes -> far fewer
    np.testing.assert_array_equal(decode_png(payload), flat)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + payload[4:])
    # 16-bit depth and interlace are explicit NotImplemented seams
    def mutate_ihdr(offset: int, value: int) -> bytes:
        buf = bytearray(payload)
        buf[8 + 8 + offset] = value  # sig + len/type of IHDR
        data = bytes(buf[16:29])
        crc = zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF
        buf[29:33] = struct.pack(">I", crc)
        return bytes(buf)

    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(mutate_ihdr(8, 16))
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(mutate_ihdr(12, 1))


def test_builtin_tier_dispatches_png_by_magic(spark):
    """PNG payloads flow through decoder='builtin' end to end in the
    Spark kernel (magic dispatch vs PGM), features = exact row means of
    the ORIGINAL bytes after filter reconstruction."""
    import numpy as np

    from knovexlite_spark.ops.multimodal import png_payload

    rng = np.random.default_rng(17)
    imgs = {i: rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for i in range(3)}
    media = spark.createDataFrame(
        [
            (i, "image", bytearray(png_payload(px, filters="cycle")), {})
            for i, px in imgs.items()
        ],
        schema=MEDIA_SCHEMA,
    )
    rows = decode_and_featurize(media, decoder="builtin").collect()
    assert len(rows) == 3
    for r in rows:
        want = imgs[r["media_id"]].mean(axis=1) / 255.0
        np.testing.assert_allclose(r["feat"], want.astype(np.float32), rtol=1e-6)


def test_wav_audio_features_stdlib_decode(spark):
    """REAL audio decode through the stdlib wave module: a synthesized
    16-bit PCM sine + a silent half must produce per-bucket RMS matching
    NumPy exactly (loud buckets ~ A/sqrt(2), silent buckets ~ 0)."""
    import io
    import wave as wavmod

    import numpy as np

    from knovexlite_spark.ops.multimodal import audio_features

    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    sine[rate // 2 :] = 0.0  # second half silent
    pcm = (sine * 32767).astype("<i2")
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    media = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()), {})], schema=MEDIA_SCHEMA
    )
    row = audio_features(media, n_buckets=4).collect()[0]
    assert row["sample_rate"] == rate and row["n_samples"] == rate
    samples = pcm.astype(np.float64) / 32768.0
    edges = np.linspace(0, rate, 5).astype(int)
    want = [
        float(np.sqrt(np.mean(samples[a:b] ** 2)))
        for a, b in zip(edges[:-1], edges[1:])
    ]
    np.testing.assert_allclose(row["feat"], np.asarray(want, dtype=np.float32), rtol=1e-5)
    assert row["feat"][0] > 0.3 and abs(row["feat"][3]) < 1e-6


def test_video_pgm_stream_frame_decode(spark):
    """Dependency-free video path: 25 concatenated PGM frames, sampled
    every 10 -> frames 0/10/20 decoded with features matching exact
    byte arithmetic; the sampled indices equal sample_frames' output
    for the same frame count."""
    import numpy as np

    from knovexlite_spark.ops.multimodal import decode_pgm_stream, video_frame_features

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(8, 8), dtype=np.uint8) for _ in range(25)]
    payload = b"".join(_pgm_bytes(f) for f in frames)
    back = decode_pgm_stream(payload)
    assert len(back) == 25
    np.testing.assert_array_equal(back[13], frames[13])

    media = spark.createDataFrame(
        [(7, "video", bytearray(payload), {"n_frames": "25"})], schema=MEDIA_SCHEMA
    )
    rows = video_frame_features(media, every_n=10).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 10, 20]
    meta_idx = sorted(r["frame_idx"] for r in sample_frames(media, every_n=10).collect())
    assert meta_idx == [0, 10, 20]  # metadata path agrees with decode path
    for r in rows:
        want = frames[r["frame_idx"]].mean(axis=1) / 255.0
        np.testing.assert_allclose(r["feat"], want.astype(np.float32), rtol=1e-6)


def test_wav_energy_sums_integer_exact(spark):
    """wav_pcm16_payload wraps raw s16le PCM in a container the stdlib
    wave module accepts, and audio_energy_sums reproduces the exact
    int64 per-bucket sums of squared samples."""
    import numpy as np

    from knovexlite_spark.ops.multimodal import audio_energy_sums, wav_pcm16_payload

    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=64, dtype=np.int64)
    payload = wav_pcm16_payload(samples.astype("<i2").tobytes())
    media = spark.createDataFrame(
        [(5, "audio", bytearray(payload), {})], schema=MEDIA_SCHEMA
    )
    rows = audio_energy_sums(media, n_buckets=4).orderBy("bucket").collect()
    want = (samples**2).reshape(4, 16).sum(axis=1)
    assert [r["energy"] for r in rows] == [int(v) for v in want]
    assert all(r["n_samples"] == 64 for r in rows)
    with pytest.raises(Exception, match="divisible"):
        audio_energy_sums(media, n_buckets=7).collect()


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


def test_image_dhash_recompression_invariance_and_near_dup(spark):
    """dHash (round 7): a JPEG-recompressed copy of an image hashes
    within hamming 3 of the original (the image-dedup use case:
    re-encoded copies byte dedup misses), unrelated images do not
    pair, and the banding machinery finds exactly the true pairs."""
    import numpy as np

    from knovexlite_spark.ops.jpeg import jpeg_payload
    from knovexlite_spark.ops.multimodal import (
        image_dhash,
        image_near_duplicates,
    )

    rng = np.random.default_rng(83)
    # structured image: smooth gradients + blocks (clear comparisons,
    # few near-ties for the DCT roundtrip to flip)
    base = (
        np.add.outer(np.linspace(0, 200, 32), np.linspace(0, 40, 32))
        .astype(np.uint8)
    )
    base[8:16, 8:24] = 230
    base[20:28, 4:12] = 20
    other = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    hdr = b"P5\n32 32\n255\n"
    rows = [
        (1, bytearray(hdr + base.tobytes())),            # original (PGM)
        (2, bytearray(jpeg_payload(base))),              # JPEG re-encode
        (3, bytearray(hdr + other.tobytes())),           # unrelated
        (4, bytearray(hdr + (255 - base).tobytes())),    # inverted: far
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    ham = lambda a, b: bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
    assert ham(1, 2) <= 3     # recompressed copy collides
    assert ham(1, 4) >= 30    # inversion flips (almost) every gradient
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_near_duplicates(media).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all({3, 4} & set(p) == set() or p == (1, 2) for p in pairs)


def test_dhash_rejects_images_smaller_than_grid():
    """ADVICE r7 (low): an image smaller than the 8x9 dHash grid used
    to produce empty np.array_split buckets (NaN means) and a garbage
    all-false-gradient hash with only a RuntimeWarning.  It must raise
    a descriptive error instead."""
    import numpy as np
    import pytest as _pytest

    from knovexlite_spark.ops.multimodal import _area_mean_resize

    tiny = np.arange(6.0 * 7).reshape(6, 7)  # 6x7 < 8x9 target
    with _pytest.raises(ValueError, match="smaller than the.*target grid"):
        _area_mean_resize(tiny, 8, 9)
    # exactly grid-sized is fine (identity buckets)
    ok = _area_mean_resize(np.arange(8.0 * 9).reshape(8, 9), 8, 9)
    assert ok.shape == (8, 9) and not np.isnan(ok).any()
