"""Fuzzy decontamination (asymmetric broadcast MinHash-LSH):
equivalence with the symmetric pipeline restricted to cross-split
pairs, production-hash parity, and split hygiene. The registry
entry's full DuckDB value compare runs via tests/test_oracle.py and
the driver gate (plans/curation_q.py::DECONTAMINATE_FUZZY_SQL).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from last_minute_legends_spark.functions.portable_hash import (
    concat_band_key,
    md5_perm_hash,
)
from last_minute_legends_spark.operators.dedup import (
    minhash_lsh_cross,
    minhash_lsh_pairs,
)
from last_minute_legends_spark.plans.curation_q import (
    FUZZY_DECONT_THRESHOLD,
    decontaminate_fuzzy,
    decontaminate_fuzzy_replay,
)
from last_minute_legends_spark.sources.tables import Catalog


def _split(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return (docs.filter(F.col("doc_id") % 7 != 0),
            docs.filter(F.col("doc_id") % 7 == 0))


def test_cross_equals_union_pairs_cross_subset(spark, sf_dir):
    """The asymmetric pipeline must find exactly the cross-split
    subset of what the symmetric all-pairs pipeline finds on the
    whole corpus (same portable hash ⇒ same signatures ⇒ same band
    collisions), with identical exact-Jaccard values — i.e. the
    broadcast specialization changes the plan, not the answer."""
    union_pairs = minhash_lsh_pairs(
        Catalog(spark, sf_dir).documents,
        threshold=FUZZY_DECONT_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
    ).collect()
    expect = set()
    for r in union_pairs:
        a_eval, b_eval = r["doc_a"] % 7 == 0, r["doc_b"] % 7 == 0
        if a_eval != b_eval:  # exactly one side is an eval doc
            tr, ev = (r["doc_b"], r["doc_a"]) if a_eval else (r["doc_a"], r["doc_b"])
            expect.add((tr, ev, r["jaccard"]))
    got = {(r["doc_id"], r["ref_doc_id"], r["jaccard"])
           for r in decontaminate_fuzzy_replay(spark, sf_dir).collect()}
    assert got == expect
    assert got, "fixture corpus must contain cross-split near-dups"


def test_production_hash_parity(spark, sf_dir):
    """The production entry (xxhash64) and its replay twin (md5) band
    the same docs together at fixture scale — the injected hash
    changes no semantics, so the replay twin's driver value oracle
    covers the production form transitively (the r14 split's load-
    bearing assumption), mirroring test_hash_replay's parity lock for
    the symmetric pipeline."""
    prod = {(r["doc_id"], r["ref_doc_id"], r["jaccard"])
            for r in decontaminate_fuzzy(spark, sf_dir).collect()}
    replay = {(r["doc_id"], r["ref_doc_id"], r["jaccard"])
              for r in decontaminate_fuzzy_replay(spark, sf_dir).collect()}
    assert prod == replay


def test_split_hygiene(spark, sf_dir):
    """Every output row pairs a train doc with an eval doc and meets
    the threshold."""
    for r in decontaminate_fuzzy(spark, sf_dir).collect():
        assert r["doc_id"] % 7 != 0
        assert r["ref_doc_id"] % 7 == 0
        assert r["jaccard"] >= FUZZY_DECONT_THRESHOLD
