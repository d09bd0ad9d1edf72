"""Multimodal column plumbing: opaque binary payloads + typed metadata.

An LLM-data pipeline carries images/audio/video as ``binary`` columns
with typed metadata alongside. The Spark-side plumbing here is real —
schema, Arrow batching, mapInPandas signature — while the actual
media decode is STUBBED deterministically (`decode_media` raises
NotImplementedError; the feature extractor catches it and derives
features from the raw bytes instead), because no image/audio libs
exist in this container.

Scale shape: mapInPandas streams Arrow record batches through Python
once — no per-row round trips. The binary column never passes through
a shuffle before feature extraction (extract early, shuffle the small
feature vectors instead of the blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, fake_width int, "
    "fake_height int, byte_mean double"
)


def decode_media(payload: bytes) -> object:
    """Real media decode — requires PIL/ffmpeg, not in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio library; deterministic "
        "byte-level features are used instead"
    )


def _byte_features(payload: bytes) -> tuple[int, int, int, int, float]:
    n = len(payload)
    checksum = sum(payload) % (1 << 31)
    # deterministic fake dimensions derived from the payload bytes
    fake_width = 64 + (checksum % 193)
    fake_height = 64 + ((checksum // 193) % 129)
    byte_mean = (sum(payload) / n) if n else 0.0
    return n, checksum, fake_width, fake_height, byte_mean


def extract_features(binary_df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of
    (id, payload: binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    decode_media(raw)
                except NotImplementedError:
                    pass
                n, checksum, w, h, mean = _byte_features(raw)
                feats.append((doc_id, n, checksum, w, h, mean))
            yield pd.DataFrame(
                feats,
                columns=["doc_id", "n_bytes", "checksum", "fake_width",
                         "fake_height", "byte_mean"],
            )

    src = binary_df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=FEATURE_SCHEMA)
