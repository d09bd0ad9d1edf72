"""Cross-engine value replay of the MinHash-LSH and SimHash pipelines.

The production operators hash with ``xxhash64`` — the fastest JVM
codegen path, but a function no second engine implements — so their
external check has been rows-only (plus the brute-force recall
cross-checks in tests/test_operators.py). Here the SAME operator code
runs with an injected md5-prefix hash (first 15 hex chars of md5 →
60-bit non-negative int) that DuckDB computes bit-for-bit identically,
and a from-scratch DuckDB replay recomputes shingles → permutation
min-hashes → band keys → length-filtered candidates → exact-Jaccard
verify (resp. token hashes → per-bit majority → 16-bit bands →
hamming verify). A full rows+schema+values compare then covers every
arithmetic step of the banding pipelines, not just their row counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.portable_hash import (
    concat_band_key as _spark_band_hash,
    duck_hash60 as _dh,
    md5_hash60 as _md5h,
    md5_perm_hash as _spark_perm_hash,
)
from last_minute_legends_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
)
# r12: the minhash replay formulation is now a REGISTRY entry
# (dedup_minhash_lsh_replay) with driver-side ORACLE_SQL; this test
# keeps running the identical compare locally against the shared SQL.
# r13: the simhash replay formulation is ALSO a registry entry now
# (dedup_simhash_replay); both shared SQLs come from dedup_q so the
# local compares and the driver gate always run the identical oracle.
from last_minute_legends_spark.plans.dedup_q import (
    _minhash_replay_sql,
    _simhash_replay_sql,
)

from last_minute_legends_spark.sources.tables import Catalog
from tests.oracle import compare, run_oracle

THRESHOLD = 0.8
MAX_HAMMING = 3


def _simhash128_replay_sql() -> str:
    """From-scratch DuckDB replay of the 128-bit wide pipeline:
    two independent 64-bit majority words (word 0 = md5(t), word 1 =
    md5(t || ':1') — matching the injected Spark hashes), 4x32-bit
    bands across both words, summed-hamming verify."""
    def word_cte(w: int, hexpr: str) -> str:
        csum = ", ".join(f"sum((h >> {b}) & 1) AS c{b}" for b in range(64))
        majority = " | ".join(
            f"(CASE WHEN 2 * c{b} > n THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
            for b in range(64)
        )
        return f"""h{w} AS (
    SELECT doc_id, {hexpr} AS h FROM tokd
), sums{w} AS (
    SELECT doc_id, count(*) AS n, {csum} FROM h{w} GROUP BY doc_id
), sig{w} AS (
    SELECT doc_id, ({majority}) AS sh{w} FROM sums{w}
)"""

    return f"""
WITH tokd AS (
    SELECT DISTINCT doc_id, t
    FROM (
        SELECT doc_id,
               unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS t
        FROM documents
    )
), {word_cte(0, _dh('t'))},
{word_cte(1, _dh("t || ':1'"))},
sig AS (
    SELECT sig0.doc_id, sh0, sh1 FROM sig0 JOIN sig1 USING (doc_id)
), bands AS (
    SELECT doc_id, sh0, sh1, w * 2 + k AS band,
           ((CASE WHEN w = 0 THEN sh0 ELSE sh1 END) >> (32 * k)) & 4294967295 AS bv
    FROM sig, UNNEST([0, 1]) tw(w), UNNEST([0, 1]) tk(k)
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming
FROM pairs WHERE hamming <= {MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select("doc_id", "text")


def test_minhash_lsh_duckdb_replay(spark, sf_dir, docs):
    sdf = minhash_lsh_pairs(
        docs, threshold=THRESHOLD,
        perm_hash=_spark_perm_hash, band_hash=_spark_band_hash,
    ).orderBy("doc_a", "doc_b")
    odf = run_oracle(_minhash_replay_sql(), sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "minhash replay: " + "\n".join(issues)


def test_simhash_duckdb_replay(spark, sf_dir, docs):
    sdf = simhash_pairs(
        docs, max_hamming=MAX_HAMMING, token_hash=_md5h
    ).orderBy("doc_a", "doc_b")
    odf = run_oracle(_simhash_replay_sql(), sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "simhash replay: " + "\n".join(issues)


def test_simhash_wide_duckdb_replay(spark, sf_dir, docs):
    """Bit-for-bit external check of the 128-bit path (the >=1M-doc
    size-switch tier): both majority words, the 4x32 banding, and the
    summed hamming verify, recomputed from scratch in DuckDB with the
    same injected md5-prefix hashes."""
    from last_minute_legends_spark.functions.portable_hash import (
        md5_word_hash,
    )

    sdf = simhash_pairs(
        docs, max_hamming=MAX_HAMMING, token_hash=_md5h, n_bits=128,
        word_hash=md5_word_hash,
    ).orderBy("doc_a", "doc_b")
    odf = run_oracle(_simhash128_replay_sql(), sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "simhash128 replay: " + "\n".join(issues)


def test_injected_hash_changes_nothing_semantic(spark, sf_dir, docs):
    """The injection must not change WHAT the pipeline finds when the
    hash is the production one: default-vs-explicit-default parity."""
    from last_minute_legends_spark.operators.dedup import _xx_perm_hash

    a = minhash_lsh_pairs(docs, threshold=THRESHOLD)
    b = minhash_lsh_pairs(docs, threshold=THRESHOLD,
                          perm_hash=_xx_perm_hash, band_hash=F.xxhash64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
