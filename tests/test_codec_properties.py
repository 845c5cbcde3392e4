"""Property-based codec tests (pure Python, no Spark session).

The JPEG property run earned its keep immediately — it found a
constant-padded 1x2 image violating the empirical roundtrip bound and
forced the provable one (tests/test_jpeg.py).  These extend the same
treatment to the LOSSLESS codecs, where the property is sharper:
bit-exact roundtrips for arbitrary shapes, values, and filter choices.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from knovexlite_spark.ops.multimodal import (
    decode_pgm,
    decode_png,
    decode_wav,
    png_payload,
    wav_pcm16_payload,
)


def _pgm_payload(px: np.ndarray) -> bytes:
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()

_gray = hnp.arrays(
    dtype=np.uint8,
    shape=st.tuples(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
    ),
    elements=st.integers(min_value=0, max_value=255),
)


@settings(max_examples=40, deadline=None)
@given(data=_gray, filt=st.sampled_from([0, 1, 2, 3, 4, "cycle"]))
def test_png_grayscale_roundtrip_is_exact(data, filt):
    np.testing.assert_array_equal(decode_png(png_payload(data, filters=filt)), data)


@settings(max_examples=25, deadline=None)
@given(
    data=hnp.arrays(
        dtype=np.uint8,
        shape=st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
            st.just(3),
        ),
        elements=st.integers(min_value=0, max_value=255),
    )
)
def test_png_rgb_reduces_to_exact_integer_luma(data):
    got = decode_png(png_payload(data, filters="cycle"))
    r, g, b = (data[..., i].astype(np.int64) for i in range(3))
    want = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(data=_gray)
def test_pgm_roundtrip_is_exact(data):
    np.testing.assert_array_equal(decode_pgm(_pgm_payload(data)), data)


@settings(max_examples=40, deadline=None)
@given(
    payload=st.binary(min_size=2, max_size=256).filter(lambda b: len(b) % 2 == 0),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_pcm16_roundtrip_is_exact(payload, rate):
    samples, got_rate = decode_wav(wav_pcm16_payload(payload, rate=rate))
    assert got_rate == rate
    want = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    np.testing.assert_allclose(samples, want, rtol=0, atol=0)
