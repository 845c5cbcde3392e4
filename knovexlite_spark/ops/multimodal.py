"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata.

The Spark-side machinery — schemas, batched mapInPandas decode
signatures, frame sampling partitioning — is real and tested.  The
actual codec calls are STUBBED (this container ships no image/audio
libraries): ``decode_image`` raises NotImplementedError unless a
deterministic fake decoder is requested, which produces stable fake
pixels from the bytes so downstream feature plumbing can be exercised
end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media rows: (media_id, kind, payload BINARY, meta MAP<STRING,STRING>)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = "media_id long, width int, height int, feat array<float>"


def _fake_decode(payload: bytes, width: int = 8, height: int = 8) -> np.ndarray:
    """Deterministic fake decoder: bytes -> stable pseudo-pixels.
    Replaces PIL/libvips in this container; same shape contract."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_and_featurize(
    media: DataFrame, use_fake_decoder: bool = False, width: int = 8, height: int = 8
) -> DataFrame:
    """Arrow-batched decode -> feature extraction.  Real pipeline shape:
    payload bytes never leave the executor, features (small) do.  The
    codec call is the only stub."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats, ws, hs = [], [], []
            for payload in pdf["payload"]:
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real image/audio decoding requires PIL/soundfile; "
                        "pass use_fake_decoder=True for the deterministic stub"
                    )
                px = _fake_decode(bytes(payload), width, height)
                # toy features: row means, normalized
                feats.append((px.mean(axis=1) / 255.0).astype(np.float32))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.asarray(ws, dtype=np.int32),
                    "height": np.asarray(hs, dtype=np.int32),
                    "feat": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, frame_count_key: str = "n_frames"
) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index,
    JVM-side (explode over a sequence bounded by the metadata frame
    count).  The decode of each sampled frame is the stubbed step."""
    n = F.coalesce(
        F.element_at(F.col("meta"), frame_count_key).cast("int"), F.lit(0)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))).alias(
            "frame_idx"
        ),
    )
