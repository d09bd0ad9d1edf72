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

def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Explicit repartition before the Arrow pass: a single-split scan
    would serialize all Python workers onto one core (same rationale
    as operators/dedup._spread)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(id_col))


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

    src = _spread(binary_df, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes long, "
    "frame_checksum long"
)


def sample_frames(binary_df: DataFrame, frame_size: int = 64,
                  stride: int = 4, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame sampling over opaque video-ish payloads: chunk each
    payload into fixed-size frames and keep every ``stride``-th one —
    a 1→N mapInPandas (one input row fans out to its sampled frames,
    still a single Arrow pass, no shuffle). With a real codec the
    chunker becomes keyframe extraction; the per-frame feature here is
    the deterministic byte checksum stand-in."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = (len(raw) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    off = fi * frame_size
                    chunk = raw[off:off + frame_size]
                    rows.append(
                        (doc_id, fi, off, len(chunk), sum(chunk) % (1 << 31))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_offset",
                         "frame_bytes", "frame_checksum"],
            )

    src = _spread(binary_df, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_bytes long, out_width int, out_height int, "
    "out_bytes long"
)


def resize_images(binary_df: DataFrame, out_width: int = 64,
                  out_height: int = 64, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Image resize plumbing: the decode→resize→re-encode step is
    stubbed (``decode_media`` raises; no image libs in this
    container), so the output byte size is the deterministic
    3-bytes-per-pixel stand-in — but the operator's Spark shape
    (Arrow batches in, typed rows out, blobs never shuffled) is the
    real production plan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    decode_media(raw)
                except NotImplementedError:
                    pass
                rows.append(
                    (doc_id, len(raw), out_width, out_height,
                     out_width * out_height * 3)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "src_bytes", "out_width", "out_height",
                         "out_bytes"],
            )

    src = _spread(binary_df, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=RESIZE_SCHEMA)
