"""Multimodal column plumbing: opaque binary payloads + typed metadata.

An LLM-data pipeline carries images/audio/video as ``binary`` columns
with typed metadata alongside. The Spark-side plumbing here is real —
schema, Arrow batching, mapInPandas signature — and since r12 so is
one decode path: ``decode_media`` is a pure-stdlib PNG decoder
(signature → chunk walk → IHDR geometry → zlib-inflate IDAT →
per-scanline unfilter), so PNG payloads yield their REAL pixel
geometry. Payloads in any other format still raise
NotImplementedError — the seam where PIL/ffmpeg would slot in — and
fall back to deterministic byte-level features (this container ships
no codec libraries, and the synthetic documents corpus is text-bytes,
so the oracles exercise the fallback while the unit tests plant real
PNGs through the decode path).

Scale shape: mapInPandas streams Arrow record batches through Python
once — no per-row round trips. The binary column never passes through
a shuffle before feature extraction (extract early, shuffle the small
feature vectors instead of the blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _maybe_spread(df: DataFrame, id_col: str, spread: bool) -> DataFrame:
    """Optional repartition before the Arrow pass — OFF by default.

    The default honors the module contract above: the binary column
    never passes through a shuffle; the scan's split granularity
    governs Arrow-pass parallelism, and at production scale a media
    corpus has far more files than cores, so a payload exchange buys
    nothing and moves every blob. Measured at sf0.1/local[32]
    (min-of-2, idle box): the always-on repartition this replaces
    cost 4x on the stubbed passes (features 1.0 s -> 4.6 s).

    ``spread=True`` is for the opposite regime — a genuinely
    CPU-bound decoder (seconds per image/video) reading a LOW-SPLIT
    source, where serializing the decode on a handful of cores costs
    more than one payload exchange (same trade as
    operators/dedup._spread, where the per-row work is real)."""
    if not spread:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(id_col))


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, width int, "
    "height int, byte_mean double"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (3 = palette, not supported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_media(payload: bytes) -> dict:
    """Pure-stdlib PNG decode (8-bit, non-interlaced, non-palette):
    returns ``{"width", "height", "channels", "pixels"}`` with pixels
    as an (h, w, channels) uint8 array. Anything that isn't such a
    PNG raises NotImplementedError — the seam a real codec library
    (PIL/ffmpeg) would replace; callers fall back to deterministic
    byte-level features for those rows.

    Unfiltering: filters 0/1/2 (None/Sub/Up) are vectorized per
    scanline (Sub is a per-channel-lane cumulative sum mod 256);
    filters 3/4 (Average/Paeth) take the sequential per-byte path —
    correct first, and the planted-PNG unit tests cover all five."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload; codec libraries "
                                  "for other formats are not installed")
    import struct
    import zlib

    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        if ctype == b"IHDR":
            ihdr = payload[pos + 8:pos + 8 + length]
        elif ctype == b"IDAT":
            idat.append(payload[pos + 8:pos + 8 + length])
        elif ctype == b"IEND":
            break
        pos += 12 + length  # header + data + CRC
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise NotImplementedError("truncated or chunkless PNG")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or interlace or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, color={color}, "
            f"interlace={interlace}) — 8-bit non-interlaced "
            "greyscale/RGB/alpha only")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise NotImplementedError("PNG scanline data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-lane running sum mod 256
            cur = np.cumsum(line.reshape(-1, ch), axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if f == 3:  # Average
                    pred = (a + b) // 2
                else:       # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return {"width": int(w), "height": int(h), "channels": ch,
            "pixels": out.reshape(h, w, ch)}


def _decoded_rows(raws: list[bytes]) -> dict[int, dict]:
    """{row index: decoded image} for the payloads decode_media can
    actually decode. The 8-byte signature check inside decode_media
    rejects non-PNG rows immediately, so on a corpus with no media
    payloads this costs one startswith per row.

    Catches CORRUPT payloads too, not just unsupported ones: a valid
    PNG signature followed by truncated/garbage chunk data raises
    zlib.error (bad IDAT stream) or struct.error/ValueError (chunk
    walk off the end), and one such row must fall back to byte-level
    features rather than fail the whole extract/resize job."""
    import struct
    import zlib

    out: dict[int, dict] = {}
    for i, r in enumerate(raws):
        if r[:8] != _PNG_SIG:
            continue
        try:
            out[i] = decode_media(r)
        except (NotImplementedError, zlib.error, struct.error, ValueError):
            continue
    return out


def _segment_sums(raws: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """(lens, sums) per payload, fully vectorized: one np.frombuffer
    over the concatenated batch + a cumulative-sum lookup per segment
    (exact for empty payloads, unlike reduceat). At video payload
    sizes the per-row Python ``sum(payload)`` loop this replaces was
    the dominant cost of the whole Arrow pass."""
    lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
    blob = np.frombuffer(b"".join(raws), dtype=np.uint8)
    csum = np.zeros(blob.size + 1, dtype=np.int64)
    np.cumsum(blob, dtype=np.int64, out=csum[1:])
    ends = np.cumsum(lens)
    return lens, csum[ends] - csum[ends - lens]


def extract_features(binary_df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload", *,
                     spread: bool = False) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of
    (id, payload: binary) — numpy-vectorized per batch (no per-row
    Python loops on the byte features; see _segment_sums).

    width/height are the REAL decoded dimensions for payloads
    decode_media can decode (PNG); for everything else they are the
    deterministic checksum-derived stand-ins (and the value oracle in
    plans/multimodal_q.py states exactly that formula — the synthetic
    corpus is text-bytes, so it exercises the fallback branch).
    n_bytes/checksum/byte_mean stay byte-level for every row: they
    identify the payload, not its pixels."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            decoded = _decoded_rows(raws)
            lens, sums = _segment_sums(raws)
            checksum = sums % (1 << 31)
            width = (64 + checksum % 193).astype(np.int32)
            height = (64 + (checksum // 193) % 129).astype(np.int32)
            for i, img in decoded.items():
                width[i] = img["width"]
                height[i] = img["height"]
            yield pd.DataFrame({
                # post-projection name: the source frame is selected with
                # F.col(id_col).alias("doc_id") before mapInPandas, so the
                # batch column is always "doc_id" (ADVICE r15: pdf[id_col]
                # KeyErrors for any non-default id_col)
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": lens,
                "checksum": checksum,
                "width": width,
                "height": height,
                "byte_mean": np.where(lens > 0, sums / np.maximum(lens, 1), 0.0),
            })

    src = _maybe_spread(binary_df, id_col, spread).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes long, "
    "frame_checksum long"
)


def sample_frames(binary_df: DataFrame, frame_size: int = 64,
                  stride: int = 4, id_col: str = "doc_id",
                  payload_col: str = "payload", *,
                  spread: bool = False) -> DataFrame:
    """Frame sampling over opaque video-ish payloads: chunk each
    payload into fixed-size frames and keep every ``stride``-th one —
    a 1→N mapInPandas (one input row fans out to its sampled frames,
    still a single Arrow pass, no shuffle). With a real codec the
    chunker becomes keyframe extraction; the per-frame feature here is
    the deterministic byte checksum stand-in."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_fi, out_off, out_len, out_sum = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                n = len(raw)
                n_frames = (n + frame_size - 1) // frame_size
                if n_frames == 0:
                    continue
                # all sampled frames of one payload at once: frame sums
                # via the cumulative-sum lookup (no per-frame loop —
                # the per-byte Python cost this replaces dominates at
                # video payload sizes)
                arr = np.frombuffer(raw, dtype=np.uint8)
                csum = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(arr, dtype=np.int64, out=csum[1:])
                fi = np.arange(0, n_frames, stride, dtype=np.int64)
                off = fi * frame_size
                end = np.minimum(off + frame_size, n)
                # no forced dtype: the declared mapInPandas schema types
                # the id column, so string/long ids both pass through
                out_ids.append(np.full(fi.size, doc_id))
                out_fi.append(fi)
                out_off.append(off)
                out_len.append(end - off)
                out_sum.append((csum[end] - csum[off]) % (1 << 31))
            if not out_ids:
                continue
            yield pd.DataFrame({
                "doc_id": np.concatenate(out_ids),
                "frame_idx": np.concatenate(out_fi).astype(np.int32),
                "frame_offset": np.concatenate(out_off),
                "frame_bytes": np.concatenate(out_len),
                "frame_checksum": np.concatenate(out_sum),
            })

    src = _maybe_spread(binary_df, id_col, spread).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_bytes long, out_width int, out_height int, "
    "out_bytes long"
)


def resize_images(binary_df: DataFrame, out_width: int = 64,
                  out_height: int = 64, id_col: str = "doc_id",
                  payload_col: str = "payload", *,
                  spread: bool = False) -> DataFrame:
    """Image resize: payloads decode_media can decode (PNG) get a
    REAL nearest-neighbor resample to (out_width, out_height) and
    report the resampled buffer's actual byte size (w·h·channels);
    undecodable payloads keep the deterministic 3-bytes-per-pixel
    stand-in. Either way the operator's Spark shape — Arrow batches
    in, typed geometry rows out, blobs never shuffled — is the
    production plan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            decoded = _decoded_rows(raws)
            n_rows = len(raws)
            out_bytes = np.full(n_rows, out_width * out_height * 3,
                                dtype=np.int64)
            for i, img in decoded.items():
                px = img["pixels"]
                ys = (np.arange(out_height) * img["height"]) // out_height
                xs = (np.arange(out_width) * img["width"]) // out_width
                resized = px[ys][:, xs]
                out_bytes[i] = resized.nbytes
            yield pd.DataFrame({
                # post-projection name: the source frame is selected with
                # F.col(id_col).alias("doc_id") before mapInPandas, so the
                # batch column is always "doc_id" (ADVICE r15: pdf[id_col]
                # KeyErrors for any non-default id_col)
                "doc_id": pdf["doc_id"].to_numpy(),
                "src_bytes": np.fromiter(
                    (len(r) for r in raws), dtype=np.int64, count=n_rows
                ),
                "out_width": np.full(n_rows, out_width, dtype=np.int32),
                "out_height": np.full(n_rows, out_height, dtype=np.int32),
                "out_bytes": out_bytes,
            })

    src = _maybe_spread(binary_df, id_col, spread).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=RESIZE_SCHEMA)


PHASH_SCHEMA = "doc_id long, ph0 long, ph1 long"


def _gray_ahash64(pixels: np.ndarray) -> tuple[int, int]:
    """64-bit average-hash of a decoded image, as two 32-bit words
    (lo bits 0-31, hi bits 32-63).

    Classic aHash geometry: channel-summed gray, an 8x8 grid of block
    means (block (r, c) covers rows ⌊r·h/8⌋..⌊(r+1)·h/8⌋-1, ditto
    columns), bit r·8+c set iff the block mean EXCEEDS the global
    mean. Comparisons are integer cross-multiplies
    (block_sum · total_px > total_sum · block_px — Python ints, no
    float ties to disagree about), so a resized or re-encoded copy of
    the same image lands within a few bits while distinct images
    differ in ~32. Two 32-bit words rather than one 64-bit value so
    the DuckDB replay oracle can rebuild the hash with BIGINT shifts
    (DuckDB raises on ``1::BIGINT << 63``)."""
    h, w = int(pixels.shape[0]), int(pixels.shape[1])
    gray = pixels.reshape(h, w, -1).astype(np.int64).sum(axis=2)
    total_sum, total_px = int(gray.sum()), h * w
    rb = [(r * h) // 8 for r in range(9)]
    cb = [(c * w) // 8 for c in range(9)]
    bits = 0
    for r in range(8):
        for c in range(8):
            blk = gray[rb[r]:rb[r + 1], cb[c]:cb[c + 1]]
            if blk.size and int(blk.sum()) * total_px > total_sum * blk.size:
                bits |= 1 << (r * 8 + c)
    return bits & 0xFFFFFFFF, bits >> 32


def _bytes_ahash64(payload: bytes) -> tuple[int, int]:
    """Deterministic byte-level fallback hash for payloads
    decode_media cannot decode — the 1-D analogue of _gray_ahash64:
    the byte stream split into 64 equal segments (byte j belongs to
    segment ⌊j·64/n⌋; segments can be empty when n < 64 and then
    contribute a 0 bit), bit i set iff segment i's mean exceeds the
    whole payload's mean, compared by integer cross-multiply
    (seg_sum · n > total · seg_len — exact on both engines). This
    branch IS DuckDB-expressible from hex(blob), which is what gives
    the registry entry its value-level oracle over the text-bytes
    corpus; the PNG branch is covered by planted-image unit tests."""
    n = len(payload)
    if n == 0:
        return 0, 0
    arr = np.frombuffer(payload, dtype=np.uint8)
    seg = (np.arange(n, dtype=np.int64) * 64) // n
    # float64 weights are exact for segment sums < 2^53 (a 35 TB
    # segment of 0xFF bytes) — far past any single payload
    sums = np.bincount(seg, weights=arr, minlength=64).astype(np.int64)
    cnts = np.bincount(seg, minlength=64).astype(np.int64)
    total = int(arr.sum(dtype=np.int64))
    bits = 0
    for i in range(64):
        if cnts[i] and int(sums[i]) * n > total * int(cnts[i]):
            bits |= 1 << i
    return bits & 0xFFFFFFFF, bits >> 32


def phash_images(binary_df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", *,
                 spread: bool = False) -> DataFrame:
    """(doc_id, ph0, ph1) 64-bit perceptual hash per payload — the
    image-content analogue of simhash_signatures. PNG payloads hash
    their decoded PIXELS (8x8 block-mean aHash: byte-identical files
    are irrelevant — a resized/re-encoded twin hashes a few bits
    away, which is what image dedup is FOR); everything else takes
    the deterministic byte-segment fallback. Blobs are hashed
    straight off the scan in one Arrow pass and never shuffled — only
    the 3-long hash rows move (the module's no-blob-shuffle
    contract); the banded pair join downstream is
    operators/dedup.py::hamming_band_pairs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = [bytes(p) if p is not None else b""
                    for p in pdf[payload_col]]
            decoded = _decoded_rows(raws)
            lo = np.zeros(len(raws), dtype=np.int64)
            hi = np.zeros(len(raws), dtype=np.int64)
            for i, r in enumerate(raws):
                img = decoded.get(i)
                lo[i], hi[i] = (_gray_ahash64(img["pixels"]) if img
                                else _bytes_ahash64(r))
            yield pd.DataFrame({
                # post-projection name: the source frame is selected with
                # F.col(id_col).alias("doc_id") before mapInPandas, so the
                # batch column is always "doc_id" (ADVICE r15: pdf[id_col]
                # KeyErrors for any non-default id_col)
                "doc_id": pdf["doc_id"].to_numpy(),
                "ph0": lo, "ph1": hi,
            })

    src = _maybe_spread(binary_df, id_col, spread).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col)
    )
    return src.mapInPandas(gen, schema=PHASH_SCHEMA)
