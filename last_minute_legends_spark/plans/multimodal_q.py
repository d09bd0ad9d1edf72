"""Multimodal plumbing queries (SURVEY §2.6): documents' text bytes
stand in for opaque media payloads — the binary-column schema,
metadata typing, and Arrow-batched mapInPandas path are the real
deliverable; the media decode itself is stubbed deterministically
(operators/multimodal.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)
from last_minute_legends_spark.sources.tables import Catalog


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as (doc_id, binary payload) for the mapInPandas ops.

    Deliberately NOT spread: the decode work behind these entries is a
    deterministic stub (no codec libs in this sandbox), so per-row CPU
    is trivial and a payload exchange is pure tax — measured at sf0.1
    (quiet box, min-of-2), multimodal_features goes 1.0s -> 4.6s and
    framesample 1.0s -> 3.9s when spread. Since r10 the operators
    themselves default to no-shuffle (the module contract in
    operators/multimodal.py); a REAL decoder (seconds per
    image/video) on a low-split source is the one regime where their
    ``spread=True`` belongs. At 100 TB the scan has more files than
    cores and the question disappears.
    """
    docs = Catalog(spark, sf_dir).documents
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    n_bytes = F.octet_length("text").cast("long")
    magic = F.lower(F.hex(F.substring(F.col("text"), 1, 4)))
    kind = (
        F.when(n_bytes > 300, F.lit("large"))
        .when(n_bytes > 150, F.lit("medium"))
        .otherwise(F.lit("small"))
    )
    return docs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        magic.alias("magic"),
        kind.alias("kind"),
    ).orderBy("doc_id")


MULTIMODAL_META_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       lower(hex(substr(text, 1, 4))) AS magic,
       CASE WHEN strlen(text) > 300 THEN 'large'
            WHEN strlen(text) > 150 THEN 'medium'
            ELSE 'small' END AS kind
FROM documents ORDER BY doc_id
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(_payloads(spark, sf_dir)).orderBy("doc_id")


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 64-byte 'frame' of each payload — the 1→N fan-out
    shape a video keyframe sampler has at scale. The oracle checks the
    fan-out geometry (index/offset/size); the per-frame checksum stays
    operator-internal, covered by the unit test."""
    return (
        sample_frames(_payloads(spark, sf_dir), frame_size=64, stride=4)
        .select("doc_id", "frame_idx", "frame_offset", "frame_bytes")
        .orderBy("doc_id", "frame_idx")
    )


# The frame chunking is byte arithmetic, so it IS SQL-expressible — a
# generate_series oracle keeps even this mapInPandas path hash-checked.
MULTIMODAL_FRAMESAMPLE_SQL = """
WITH doc AS (
    SELECT doc_id, strlen(text) AS n
    FROM documents
    WHERE strlen(text) > 0
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 64 AS BIGINT) AS frame_offset,
       CAST(least(64, n - i * 64) AS BIGINT) AS frame_bytes
FROM doc, UNNEST(generate_series(0, CAST(ceil(n / 64.0) AS BIGINT) - 1)) t(i)
WHERE i % 4 = 0
ORDER BY doc_id, frame_idx
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing over the documents-as-payloads frame: the
    decode→resize→re-encode step is stubbed (no codec libs here), so
    the checked surface is the operator's Spark shape — Arrow batches
    in, typed geometry rows out, blobs never shuffled. Geometry is
    asserted in tests/test_operators.py."""
    return resize_images(
        _payloads(spark, sf_dir), out_width=64, out_height=48
    ).orderBy("doc_id")


# The deterministic byte-level features ARE SQL-expressible — the
# byte sum comes out of DuckDB's hex(blob) as per-pair integer sums
# (exact for any UTF-8 payload, unlike ord()-per-char) — so even the
# mapInPandas paths get a value-level DuckDB compare. Since r10 the
# resize oracle sits in the driver window (SQL dict below); features
# runs past the window, hence LOCAL_SQL
# (tests/test_oracle.py::test_local_oracle_match).
MULTIMODAL_FEATURES_SQL = """
WITH d AS (
    SELECT doc_id, strlen(text) AS n, hex(text::BLOB) AS hx
    FROM documents
), e AS (
    SELECT doc_id,
           ('0x' || substr(hx, 2 * i - 1, 2))::INT AS byte
    FROM d, UNNEST(generate_series(1, n)) t(i)
    WHERE n > 0
), s AS (
    SELECT doc_id, CAST(sum(byte) AS BIGINT) AS bsum
    FROM e GROUP BY doc_id
), f AS (
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_bytes,
           coalesce(s.bsum, 0) % 2147483648 AS checksum,
           coalesce(s.bsum, 0) AS bsum
    FROM d LEFT JOIN s ON s.doc_id = d.doc_id
)
SELECT doc_id, n_bytes, checksum,
       -- the stand-in geometry formula: REAL decoded dimensions land
       -- here for PNG payloads (operators/multimodal.py decode_media),
       -- but this corpus is text-bytes so every row takes the fallback
       CAST(64 + checksum % 193 AS INT) AS width,
       CAST(64 + (checksum // 193) % 129 AS INT) AS height,
       CASE WHEN n_bytes > 0 THEN bsum / CAST(n_bytes AS DOUBLE)
            ELSE 0.0 END AS byte_mean
FROM f ORDER BY doc_id
"""

MULTIMODAL_RESIZE_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS src_bytes,
       CAST(64 AS INT) AS out_width,
       CAST(48 AS INT) AS out_height,
       CAST(64 * 48 * 3 AS BIGINT) AS out_bytes
FROM documents ORDER BY doc_id
"""

PHASH_MAX_HAMMING = 3
PHASH_PLANT_MOD = 25


def _phash_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) corpus for the perceptual-hash entries:
    documents as binary plus an IN-PLACE single-char-substituted
    companion every 25th doc (NOT an append: appending shifts every
    byte-segment boundary — measured hamming 5-23, undetectable at
    the 3-bit threshold — while an overwrite perturbs one segment's
    mean, measured hamming 0-2 vs a cross-doc background floor of
    16). One home shared by dedup_phash and dedup_phash_delta so the
    single-shot and incremental forms hash the identical corpus."""
    from last_minute_legends_spark.plans.dedup_q import _plant_offset

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % PHASH_PLANT_MOD == 0).crossJoin(
        _plant_offset(docs, "doc_id")
    ).select(
        (F.col("doc_id") + F.col("_plant_off")).alias("doc_id"),
        F.concat(F.lit("~"), F.expr("substring(text, 2)")).alias("text"),
    )
    return (
        docs.unionByName(planted)
        .filter(F.octet_length("text") > 0)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )


def dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup — where the multimodal and dedup
    families meet (LAION-style corpora dedup on image CONTENT, not
    bytes): 64-bit aHash per payload (operators/multimodal.py::
    phash_images — decoded 8x8 block means for PNGs, the
    deterministic byte-segment fallback for everything else), then
    hamming-banded candidate pairs through the SAME band machinery
    the simhash tier uses (operators/dedup.py::hamming_band_pairs,
    4x16 bands, pigeonhole recall for hamming <= 3).

    De-vacuization plant: see _phash_payloads (in-place substituted
    companions every 25th doc; measured hamming <= 2 vs background
    >= 16) — so the hash compare proves the hash arithmetic, the
    banding, and the hamming verify on real nonzero pairs. The corpus
    is text-bytes, so the driver oracle replays the byte-segment
    branch from hex(blob) in DuckDB bit-for-bit; the PIXEL branch
    (resized/re-encoded PNG twins found, distinct images not) is
    locked by tests/test_operators.py planted PNGs. Blobs are hashed
    in one Arrow pass off the scan and never shuffled — only
    (doc_id, ph0, ph1) rows enter the band join."""
    from last_minute_legends_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from last_minute_legends_spark.operators.multimodal import phash_images

    sig, lazy = _dedup_phash_plan(spark, sf_dir)
    # eager materialize + unpersist: persist hygiene across the
    # driver's 116-entry single-session sweep (VERDICT r16 #6)
    out = lazy.localCheckpoint(eager=True)
    sig.unpersist()
    return out


def _dedup_phash_plan(spark: SparkSession, sf_dir: str):
    """(persisted signature frame, LAZY pair frame) — the
    pre-materialization plan the no-blob-shuffle contract is asserted
    on (tests/test_plans.py): the public entry eagerly checkpoints
    for persist hygiene, which collapses its visible plan to a
    LogicalRDD scan."""
    from last_minute_legends_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from last_minute_legends_spark.operators.multimodal import phash_images

    sig = phash_images(_phash_payloads(spark, sf_dir)).persist()
    lazy = hamming_band_pairs(
        sig, ["ph0", "ph1"], [32, 32], band_width=16,
        max_hamming=PHASH_MAX_HAMMING,
    ).orderBy("doc_a", "doc_b")
    return sig, lazy


def dedup_phash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL image dedup — the r15 delta-dedup lifecycle
    (operators/dedup_delta.py) generalized to the hamming family: the
    base corpus' perceptual-hash signature bands are a write-once
    layout (partitioned by (band, bvb), bv-sorted files, stored pair
    set beside it — cached per corpus fingerprint); a new epoch of
    images (doc_id % 5 == 0 here) hashes in one Arrow pass and
    absorbs with signature-sized work. Even lighter than the MinHash
    form: the exact verify is popcount arithmetic over signature
    words CARRIED ON the band rows of both sides, so absorbing an
    epoch never re-reads the indexed corpus at all. Same size-gated
    planning-literal probes, same add-only appends (chaining and
    byte-identity locked in tests/test_dedup_delta.py).

    Returns stored ∪ delta-involving pairs = the single-shot
    dedup_phash output over the full corpus (per-document banding
    decomposes exactly), so the oracle is the UNCHANGED single-shot
    replay SQL — the dedup_delta incremental-oracle pattern on the
    image tier."""
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_hamming_delta, write_hamming_index,
    )
    from last_minute_legends_spark.operators.multimodal import phash_images
    from last_minute_legends_spark.sources import layout_cache

    payloads = _phash_payloads(spark, sf_dir)
    base = payloads.filter(F.col("doc_id") % 5 != 0)
    delta = payloads.filter(F.col("doc_id") % 5 == 0)
    idx = layout_cache.layout_dir(
        "phash_band_index",
        os.path.join(sf_dir, "documents.parquet"),
        f"v1-mod5-h{PHASH_MAX_HAMMING}")
    def _build(tmp: str) -> None:
        base_sig = phash_images(base).persist()
        write_hamming_index(base_sig, tmp, ["ph0", "ph1"], [32, 32],
                            band_width=16,
                            max_hamming=PHASH_MAX_HAMMING)
        base_sig.unpersist()

    layout_cache.build_once(idx, _build)
    delta_sig = phash_images(delta).persist()
    # read-only absorb: the cached layout is shared across processes.
    # Eager materialize + release (VERDICT r16 #6 persist hygiene)
    from last_minute_legends_spark.operators.dedup_delta import (
        release_absorb_persists,
    )

    out = absorb_hamming_delta(
        spark, delta_sig, idx, append=False,
    ).orderBy("doc_a", "doc_b").localCheckpoint(eager=True)
    delta_sig.unpersist()
    release_absorb_persists()
    return out


def stream_phash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING image dedup (r17, VERDICT r16 #2) — the hamming-tier
    incremental lifecycle on the Structured Streaming ingest path
    (streaming/pipeline.py::run_stream_phash_delta), the LAION shape:
    a quarter of the perceptual-hash corpus seeds the hamming band
    index, the rest arrives base64-framed over a JSON file-stream
    topic one epoch per micro-batch, and ``foreachBatch`` absorbs
    each epoch with signature-sized work (the popcount verify rides
    the band rows — no corpus re-read, no landing dir), consulting
    ``band_index_health`` every few epochs. The final stored pair set
    equals the single-shot dedup_phash output over the full corpus,
    so the oracle is the UNCHANGED byte-segment replay
    DEDUP_PHASH_SQL; redelivery idempotence and chained-absorb
    equality are locked in tests/test_dedup_delta.py /
    tests/test_labels_store.py patterns (test_stream_phash_delta)."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_phash_delta,
    )

    return run_stream_phash_delta(
        spark, sf_dir, n_epochs=4, cache_tag="v1",
    ).orderBy("doc_a", "doc_b")


# From-scratch DuckDB replay of the byte-segment aHash + 4x16 banding
# + hamming verify: byte extraction from hex(blob), per-segment
# integer cross-multiply bits, two 32-bit words (DuckDB cannot shift
# into BIGINT bit 63), band join, popcount-of-xor. Every intermediate
# must agree with the Arrow pass for the final frame to value-match.
DEDUP_PHASH_SQL = f"""
WITH base AS (
    SELECT doc_id, text FROM documents
), planted AS (
    SELECT doc_id + (SELECT max(doc_id) + 1 FROM base) AS doc_id,
           '~' || substr(text, 2) AS text
    FROM base WHERE doc_id % {PHASH_PLANT_MOD} = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
), d AS (
    -- encode() is the UTF-8 VARCHAR->BLOB conversion (a ::BLOB cast
    -- would reject non-ASCII text), matching Spark's string->binary
    SELECT doc_id, octet_length(encode(text)) AS n,
           hex(encode(text)) AS hx
    FROM allv WHERE octet_length(encode(text)) > 0
), e AS (
    SELECT doc_id, n, i - 1 AS j,
           ('0x' || substr(hx, 2 * i - 1, 2))::BIGINT AS byte
    FROM d, UNNEST(generate_series(1, n)) t(i)
), segs AS (
    SELECT doc_id, n, ((j * 64) // n)::INT AS s,
           sum(byte)::BIGINT AS ssum, count(*)::BIGINT AS scnt
    FROM e GROUP BY doc_id, n, ((j * 64) // n)::INT
), tot AS (
    SELECT doc_id, sum(byte)::BIGINT AS total FROM e GROUP BY doc_id
), onbits AS (
    SELECT segs.doc_id, s
    FROM segs JOIN tot ON segs.doc_id = tot.doc_id
    WHERE ssum * n > total * scnt
), sig AS (
    SELECT d.doc_id,
           coalesce(bit_or(CASE WHEN s < 32
                           THEN (1::BIGINT << s) END), 0) AS ph0,
           coalesce(bit_or(CASE WHEN s >= 32
                           THEN (1::BIGINT << (s - 32)) END), 0) AS ph1
    FROM d LEFT JOIN onbits b ON b.doc_id = d.doc_id
    GROUP BY d.doc_id
), bands AS (
    SELECT doc_id, ph0, ph1, 0 AS band, ph0 & 65535 AS bv FROM sig
    UNION ALL
    SELECT doc_id, ph0, ph1, 1, (ph0 >> 16) & 65535 FROM sig
    UNION ALL
    SELECT doc_id, ph0, ph1, 2, ph1 & 65535 FROM sig
    UNION ALL
    SELECT doc_id, ph0, ph1, 3, (ph1 >> 16) & 65535 FROM sig
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.ph0, b.ph0))
           + bit_count(xor(a.ph1, b.ph1)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming
FROM pairs WHERE hamming <= {PHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


SPARK = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_framesample": multimodal_framesample,
    "multimodal_resize": multimodal_resize,
    "dedup_phash": dedup_phash,
    "dedup_phash_delta": dedup_phash_delta,
    "stream_phash_delta": stream_phash_delta,
}

# r11: multimodal_resize, driver-hash-green on its first external
# observation (r10), lends its window slot back to the returning r10
# lenders; it and multimodal_features keep their geometry value
# checks locally (tests/test_oracle.py).
SQL = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_features": None,  # past the window: value check in LOCAL_SQL
    "multimodal_framesample": MULTIMODAL_FRAMESAMPLE_SQL,
    "multimodal_resize": None,    # past the window: value check in LOCAL_SQL
    # r15: perceptual-hash dedup — byte-segment branch replayed from
    # hex(blob); never-observed, so rotation puts it in the window
    "dedup_phash": DEDUP_PHASH_SQL,
    # r15: the incremental form converges on the identical pair set —
    # same single-shot oracle (the dedup_delta pattern)
    "dedup_phash_delta": DEDUP_PHASH_SQL,
    # r17: the streaming form chains the same absorbs — same oracle
    "stream_phash_delta": DEDUP_PHASH_SQL,
}

LOCAL_SQL = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
}
