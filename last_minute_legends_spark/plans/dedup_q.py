"""Dedup queries over the ``documents`` table (SURVEY §2.3)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.operators.dedup import (
    connected_components,
    duplicated_spans,
    embedding_lsh_pairs,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    remove_duplicated_spans,
    simhash_pairs,
)
from last_minute_legends_spark.operators.similarity import with_unit_vectors
from last_minute_legends_spark.sources.tables import Catalog

JACCARD_THRESHOLD = 0.8


def _plant_offset(df: DataFrame, id_col: str):
    """1-row ``(_plant_off)`` frame = max(id)+1, for cross-joining
    under the planted-companion selects so synthetic ids are disjoint
    from real ones at ANY corpus size. A fixed +1_000_000 constant
    collided with real ids on the >=1M-row scale-ladder corpora
    (tools/scale_bench.py runs these registry callables on generated
    spark.range corpora), interleaving two documents' positions in the
    per-doc windows. Broadcast of a 1-row aggregate — no eager driver
    action, and the id-column max comes straight from parquet column
    statistics. Every SQL oracle computes the identical offset via
    ``(SELECT max(id)+1 FROM base)``."""
    return F.broadcast(df.agg((F.max(id_col) + F.lit(1)).alias("_plant_off")))
# Near-dup semantics per SURVEY §2.3: embedding-cosine >= 0.95. (An
# earlier revision used 0.40, which only matched the random-noise tail
# of the synthetic embeddings — at that level LSH pruning is
# information-theoretically impossible: a cos=0.4 pair collides per
# sign bit w.p. 0.63 vs 0.50 for random pairs. 0.95 is the real
# near-dup operating point, where sign-LSH prunes ~97% of pairs.)
COSINE_THRESHOLD = 0.95


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (fp, n_docs, keeper_doc_id).

    The synthetic documents contain NO exact duplicates at any SF, so
    through r8 the driver's value compare was vacuous (0 rows on both
    engines — it proved only that both found nothing). Every 10th doc
    is therefore re-planted as a case+whitespace variant
    (``'  ' || upper(text)``, id offset max(doc_id)+1 — see
    ``_plant_offset``; identical arithmetic in the DuckDB oracle), so
    the hash compare now proves the normalization
    (lower/trim/whitespace-collapse), the fingerprint grouping, AND
    keeper election (min id = the original, never the planted copy)
    on real nonzero groups — the dedup_embedding de-vacuization
    pattern applied here.
    """
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 10 == 0).crossJoin(
        _plant_offset(docs, "doc_id")
    ).select(
        (F.col("doc_id") + F.col("_plant_off")).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.col("text"))).alias("text"),
    )
    return exact_duplicates(docs.unionByName(planted)).orderBy("fp")


DEDUP_EXACT_SQL = """
WITH base AS (
    SELECT doc_id, text FROM documents
), planted AS (
    SELECT doc_id + (SELECT max(doc_id) + 1 FROM base) AS doc_id,
           '  ' || upper(text) AS text
    FROM base WHERE doc_id % 10 = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
)
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       count(*) AS n_docs, min(doc_id) AS keeper_doc_id
FROM allv
GROUP BY fp HAVING count(*) > 1
ORDER BY fp
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return jaccard_pairs(docs, threshold=JACCARD_THRESHOLD).orderBy("doc_a", "doc_b")


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH tok AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
    FROM tok, UNNEST(generate_series(1, len(w) - 2)) t(i)
), sz AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard
FROM (
    SELECT doc_a, doc_b,
           inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
)
WHERE jaccard >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD).orderBy("doc_a", "doc_b")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``n_bits=None`` is the explicit opt-in to the corpus-size
    switch (64-bit signatures below 1M docs, 128-bit at or above —
    the measured 2,328x candidate cut at 1.5M docs): THIS entry is
    the one the scale ladder drives across that boundary, so it
    accepts the documented threshold tightening there; library
    callers get the size-independent 64-bit default."""
    docs = Catalog(spark, sf_dir).documents
    return simhash_pairs(docs, max_hamming=3, n_bits=None).orderBy(
        "doc_a", "doc_b")


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS (not just pairs): connected components over
    the exact Jaccard pair graph — the keeper-selection step a real
    dedup pipeline runs after pair generation. cluster_id = min doc id
    in the component (the canonical keeper).

    Layout note for 100 TB: pair generation and CC deliberately do
    NOT share a shuffle layout. The pair graph is orders of magnitude
    smaller than the exploded shingle frame (near-dup pairs vs one
    row per doc×shingle), and CC partitions by node id while the
    candidate join partitions by shingle — co-locating them would
    force the label iterations onto the shingle key space for no
    reuse. The one materialization that matters (the edge list,
    checkpointed once before iterating so the candidate pipeline
    never re-executes per round) is in connected_components itself."""
    docs = Catalog(spark, sf_dir).documents
    pairs = jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    return (
        connected_components(pairs)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


# Transitive closure via recursive min-label reachability — exact CC
# twin of the Spark label propagation (UNION dedups → terminates).
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE tok AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
    FROM tok, UNNEST(generate_series(1, len(w) - 2)) t(i)
), sz AS (
    SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT doc_a, doc_b
    FROM (
        SELECT doc_a, doc_b,
               inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
    )
    WHERE jaccard >= {JACCARD_THRESHOLD}
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
), nodes AS (
    SELECT DISTINCT src AS id FROM edges
), reach(id, lab) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lab) AS cluster_id
FROM reach GROUP BY id ORDER BY doc_id
"""


def _embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) corpus for the embedding-dedup entries:
    the synthetic vectors plus a planted near-dup every 50th (same
    deterministic arithmetic as the DuckDB oracle: +0.1 on the first
    component, id offset max+1). ONE home shared by the single-shot
    and incremental forms so both hash the identical corpus.

    Deliberately NOT spread_cpu_scan'd: measured at sf0.1 (quiet
    box, min-of-2), spreading the 2k-row single-file embeddings scan
    costs 3.3s -> 5.1s — the exchange of the vector column outweighs
    the 64-plane fold, which Tungsten chews through in-line. At
    100 TB the dataset has more files than cores and spread_cpu_scan
    is a structural no-op anyway."""
    emb_raw = Catalog(spark, sf_dir).embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb_raw.filter(F.col("vec_id") % 50 == 0).crossJoin(
        _plant_offset(emb_raw, "vec_id")
    ).select(
        (F.col("vec_id") + F.col("_plant_off")).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.1)),
            F.expr("slice(embedding, 2, size(embedding) - 1)"),
        ).alias("embedding"),
    )
    return emb_raw.unionByName(planted)


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH candidates + exact-cosine verify — never all-pairs.
    The DuckDB oracle stays the exact all-pairs SQL (cheap at sf0.01),
    so any LSH recall loss at the threshold would surface as a hash
    mismatch; a planted-dup unit test covers recall independently.

    The synthetic embeddings contain NO pairs above 0.95, which made
    the driver check vacuous ("doesn't crash") through r7. Every 50th
    vector is therefore re-planted as a near-dup (same deterministic
    arithmetic on both engines: +0.1 on the first component, id
    offset max(vec_id)+1), so the value-level compare now proves the LSH finds
    real near-dups AND computes their cosines exactly.
    """
    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir))
    # Adaptive band geometry (operators.dedup.lsh_params): at sf0.01
    # the fixpoint lands on the legacy 8x8 / 10x10 shape (oracle
    # output unchanged); at 30x sf0.1 it is what removes the measured
    # n^2/2^b quadratic tier (100 s -> see BASELINE_LOCAL r9).
    return embedding_lsh_pairs(emb, threshold=COSINE_THRESHOLD).orderBy(
        "vec_a", "vec_b"
    )


DEDUP_EMBEDDING_SQL = f"""
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), planted AS (
    SELECT vec_id + (SELECT max(vec_id) + 1 FROM base) AS vec_id,
           list_concat([v[1] + 0.1], v[2:]) AS v
    FROM base WHERE vec_id % 50 = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
), n AS (
    SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM allv
)
SELECT vec_a, vec_b, round(c, 4) AS cosine
FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS c
    FROM n a JOIN n b ON a.vec_id < b.vec_id
)
WHERE c >= {COSINE_THRESHOLD}
ORDER BY vec_a, vec_b
"""


def dedup_embedding_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL embedding dedup — the delta-dedup lifecycle
    (operators/dedup_delta.py) closed over the LAST near-dup tier
    (VERDICT r15 #1, the LAION/semantic-dedup case): the base
    corpus' sign-LSH band values are a write-once (band, bvb)
    layout built with FROZEN hyperplanes (deterministic in
    (seed, plane, dim) — the frozen-centroid append pattern, nothing
    model-sized persisted), cached per corpus fingerprint; a new
    epoch of vectors (vec_id % 5 == 0 here) computes delta-sized
    plane dots against the SAME frozen planes and absorbs with
    size-gated planning-literal probes + exact-cosine verify
    (candidate-only vector fetch — the indexed side is never
    re-hashed). The adaptive-geometry wrinkle unique to this tier
    (lsh_params widens bands ~log2 n) is handled by
    embedding_index_health's re-band trigger +
    reband_embedding_index's staged atomic-swap rebuild
    (test-locked in tests/test_dedup_delta.py).

    Returns stored ∪ delta-involving pairs = the single-shot
    dedup_embedding output over the full corpus, so the oracle is
    the UNCHANGED exact all-pairs SQL (DEDUP_EMBEDDING_SQL) — the
    hash match proves both the LSH recall at the threshold AND the
    incremental decomposition in one compare."""
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_embedding_delta, write_embedding_index,
    )
    from last_minute_legends_spark.sources import layout_cache

    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir)).persist()
    base = emb.filter(F.col("id") % 5 != 0).persist()
    delta = emb.filter(F.col("id") % 5 == 0)
    idx = layout_cache.layout_dir(
        "emb_band_index",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"v1-mod5-t{COSINE_THRESHOLD}")
    layout_cache.build_once(idx, lambda tmp: write_embedding_index(
        base, tmp, COSINE_THRESHOLD))
    # read-only absorb: the cached layout is shared across processes.
    # Eager materialize + release (VERDICT r16 #6 persist hygiene)
    from last_minute_legends_spark.operators.dedup_delta import (
        release_absorb_persists,
    )

    out = absorb_embedding_delta(
        spark, base, delta, idx, append=False,
    ).orderBy("vec_a", "vec_b").localCheckpoint(eager=True)
    for f in (base, emb):
        f.unpersist()
    release_absorb_persists()
    return out


def stream_embedding_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING embedding dedup (r17) — the last near-dup tier's
    incremental lifecycle on the Structured Streaming ingest path
    (streaming/pipeline.py::run_stream_embedding_delta), completing
    the set beside MinHash (stream_dedup_delta, r15) and image
    (stream_phash_delta, r17): a quarter of the planted embedding
    corpus seeds the frozen-geometry sign-LSH band index, the rest
    arrives as JSON double arrays over a file-stream topic one epoch
    per micro-batch, and ``foreachBatch`` absorbs each epoch
    (delta-sized plane dots, size-gated literal probes, exact-cosine
    verify against the landed corpus) with the tier's FULL
    maintenance loop consulted per epoch boundary (geometry-drift
    re-band, else fragmentation compaction). Final stored pair set ==
    the single-shot dedup_embedding output, so the oracle is the
    UNCHANGED exact all-pairs DEDUP_EMBEDDING_SQL — the hash match
    proves the chained decomposition AND the LSH recall at the seed
    geometry."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_embedding_delta,
    )

    return run_stream_embedding_delta(
        spark, sf_dir, n_epochs=4, cache_tag="v1",
    ).orderBy("vec_a", "vec_b")


# --- Semantic dedup (SemDeDup) — r17 --------------------------------
# k-means-bounded near-dup pruning (Abbas et al. 2023,
# arXiv:2303.09540): cluster the embedding space, compare only
# within a cluster, keep the min-id representative of each duplicate
# group. The FIFTH near-dup tier beside jaccard / minhash / simhash /
# sign-LSH — the one whose candidate bound is LEARNED density rather
# than hashed randomness, and the standard shape for pruning
# web-scale training corpora by semantic redundancy. Geometry at the
# sf0.01 gate: SEM_K = 8 clusters (the production form scales k with
# the corpus so cluster size — and pairs per cluster — stays
# constant; see operators/similarity.py::semantic_keep). tau = 0.7 is
# SemDeDup's operating regime (looser than the 0.95 near-dup bar:
# semantic redundancy, not copy detection).
SEM_K = 8
SEM_ITERS = 3
SEM_TAU = 0.7


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the planted embedding corpus: deterministic
    Lloyd k-means (train_centroids — the IVF tier's cross-engine-
    proven derivation, md5-injected like ann_pq_topk so the DuckDB
    oracle replays the ENTIRE train → assign → within-cluster prune
    pipeline) → narrow argmax-cosine assignment → per-document
    keep/drop verdict with the kept representative and its exact
    cosine. The planted near-dups (+0.1 on component 1, every 50th
    vector) are what the verdict must catch: they land in their
    source's cluster and read cosine ≈ 1, so a missed assignment,
    wrong tiebreak, or drifted mean breaks the value hash."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import (
        semantic_keep, train_centroids,
    )

    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir)).persist()
    cent = train_centroids(emb, k=SEM_K, iters=SEM_ITERS,
                           id_hash=md5_id_hash)
    out = (semantic_keep(emb, cent, SEM_TAU)
           .withColumnRenamed("id", "vec_id")
           .orderBy("vec_id")
           .localCheckpoint(eager=True))
    emb.unpersist()
    return out


def _semantic_sql() -> str:
    """Full-derivation DuckDB replay: planted corpus → unrolled Lloyd
    (plans/ann_q.py::_lloyd_ctes — the SAME CTE chain the IVF/PQ
    replays use) → argmax-cosine assignment → within-cluster pairs →
    min-id keeper election."""
    from last_minute_legends_spark.plans.ann_q import (
        _ivf_assign_cte, _lloyd_ctes,
    )

    parts = ["""base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), planted AS (
    SELECT vec_id + (SELECT max(vec_id) + 1 FROM base) AS vec_id,
           list_concat([v[1] + 0.1], v[2:]) AS v
    FROM base WHERE vec_id % 50 = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
), n AS MATERIALIZED (
    SELECT vec_id AS id, v, sqrt(list_dot_product(v, v)) AS nrm FROM allv
)"""]
    parts.extend(_lloyd_ctes("n", SEM_K, SEM_ITERS, prefix="sd"))
    parts.append(_ivf_assign_cte("sdb", f"sdcent{SEM_ITERS}", src="n"))
    return "WITH " + ",\n".join(parts) + f""",
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b,
           list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
    FROM sdb a JOIN sdb b ON a.bucket = b.bucket AND a.id < b.id
), dom AS (
    SELECT id_b AS id, min(id_a) AS dup_of, arg_min(cos, id_a) AS dup_cos
    FROM pairs WHERE cos >= {SEM_TAU} GROUP BY id_b
)
SELECT s.id AS vec_id, s.bucket,
       CAST(d.id IS NULL AS INT) AS keep, d.dup_of,
       round(d.dup_cos, 4) AS dup_cos
FROM sdb s LEFT JOIN dom d ON d.id = s.id
ORDER BY vec_id
"""


DEDUP_SEMANTIC_SQL = _semantic_sql()


def dedup_semantic_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SemDeDup — the semantic tier joins the delta
    lifecycle (operators/dedup_delta.py::absorb_semantic_delta): the
    k-means geometry trained on the base corpus is the FROZEN model
    (the embedding tier's frozen-hyperplane / IVF frozen-centroid
    pattern), membership is a write-once bucket-partitioned layout,
    and an epoch of newly ingested vectors (ids above the 80th
    percentile — ingestion order IS id order, which makes min-id
    verdicts monotone and the verdict store append-only) assigns
    narrowly, reads only its touched clusters, fetches stored
    members' vectors candidate-only, and verdicts against
    stored-smaller-id ∪ epoch-smaller-id neighbors. Final frame ==
    the single-shot frozen-geometry prune over the full corpus, so
    the oracle replays base-only Lloyd + assign-all + prune — a
    missed cross pair (stored probe) or intra-epoch pair both break
    the hash: the planted dups below the split arrive as cross
    pairs, the ones above as intra-epoch pairs."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_semantic_delta, release_absorb_persists,
        write_semantic_index,
    )
    from last_minute_legends_spark.sources import layout_cache

    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir)).persist()
    mx = int(Catalog(spark, sf_dir).embeddings
             .agg(F.max("vec_id")).first()[0])
    split = int(mx * 0.8)
    base = emb.filter(F.col("id") < split)
    delta = emb.filter(F.col("id") >= split)
    idx = layout_cache.layout_dir(
        "sem_index", os.path.join(sf_dir, "embeddings.parquet"),
        f"v3-split80-k{SEM_K}i{SEM_ITERS}t{SEM_TAU}")
    layout_cache.build_once(idx, lambda tmp: write_semantic_index(
        base, tmp, SEM_TAU, SEM_K, SEM_ITERS, id_hash=md5_id_hash))
    out = (absorb_semantic_delta(spark, emb, delta, idx, append=False)
           .withColumnRenamed("id", "vec_id")
           .orderBy("vec_id").localCheckpoint(eager=True))
    emb.unpersist()
    release_absorb_persists()
    return out


def _semantic_delta_sql() -> str:
    """Frozen-geometry replay: Lloyd over the BASE subset only,
    assignment of the full corpus against the final base centroids,
    then the identical within-cluster min-id prune tail."""
    from last_minute_legends_spark.plans.ann_q import (
        _ivf_assign_cte, _lloyd_ctes,
    )

    parts = ["""base AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), planted AS (
    SELECT vec_id + (SELECT max(vec_id) + 1 FROM base) AS vec_id,
           list_concat([v[1] + 0.1], v[2:]) AS v
    FROM base WHERE vec_id % 50 = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
), n AS MATERIALIZED (
    SELECT vec_id AS id, v, sqrt(list_dot_product(v, v)) AS nrm FROM allv
), sp AS (
    SELECT CAST(floor(max(vec_id) * 0.8) AS BIGINT) AS s FROM base
), bn AS MATERIALIZED (
    SELECT n.id, n.v, n.nrm FROM n, sp WHERE n.id < sp.s
)"""]
    parts.extend(_lloyd_ctes("bn", SEM_K, SEM_ITERS, prefix="sd"))
    parts.append(_ivf_assign_cte("sdb", f"sdcent{SEM_ITERS}", src="n"))
    return "WITH " + ",\n".join(parts) + f""",
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b,
           list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
    FROM sdb a JOIN sdb b ON a.bucket = b.bucket AND a.id < b.id
), dom AS (
    SELECT id_b AS id, min(id_a) AS dup_of, arg_min(cos, id_a) AS dup_cos
    FROM pairs WHERE cos >= {SEM_TAU} GROUP BY id_b
)
SELECT s.id AS vec_id, s.bucket,
       CAST(d.id IS NULL AS INT) AS keep, d.dup_of,
       round(d.dup_cos, 4) AS dup_cos
FROM sdb s LEFT JOIN dom d ON d.id = s.id
ORDER BY vec_id
"""


DEDUP_SEMANTIC_DELTA_SQL = _semantic_delta_sql()


def stream_semantic_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SemDeDup (r17b) — the fourth streaming dedup
    lifecycle (streaming/pipeline.py::run_stream_semantic_delta):
    the batch ``dedup_semantic_delta`` split (bottom-80% seed, same
    frozen md5-trained geometry), the top 20% arriving as id-ORDERED
    epochs over a JSON file-stream topic, foreachBatch absorbing each
    epoch (bucket-pruned membership probe, candidate vectors from the
    landed corpus, per-epoch overwritten verdict/membership landings
    — redelivery-safe) with semantic_index_health consulted at epoch
    boundaries. Final verdict frame == the single-shot
    frozen-geometry prune, so the oracle is the UNCHANGED
    DEDUP_SEMANTIC_DELTA_SQL — the hash match proves the chained
    epoch decomposition AND the monotone-verdict contract."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_semantic_delta,
    )

    return (run_stream_semantic_delta(spark, sf_dir, n_epochs=4,
                                      cache_tag="v1")
            .withColumnRenamed("id", "vec_id").orderBy("vec_id"))


def dedup_minhash_lsh_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_minhash_lsh`` with the portable md5-prefix hash
    injected (functions/portable_hash.py) in place of the production
    xxhash64 — the SAME operator code and plan shape (shingles →
    permutation min-hashes → band keys → length-filtered candidates →
    exact-Jaccard verify), but with a hash DuckDB computes
    bit-for-bit, so the driver gate value-checks every arithmetic
    step of the banding pipeline instead of a rows-only count.
    Injected-vs-production parity is locked by
    tests/test_hash_replay.py::test_injected_hash_changes_nothing_semantic."""
    from last_minute_legends_spark.functions.portable_hash import (
        concat_band_key, md5_perm_hash,
    )

    docs = Catalog(spark, sf_dir).documents
    return minhash_lsh_pairs(
        docs, threshold=JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
    ).orderBy("doc_a", "doc_b")


# zorder_documents: the 2-D scope (a source band AND a length band)
ZDOC_SRC_LO, ZDOC_SRC_HI = 4, 7       # 4 of the 20 srcN sources
ZDOC_LEN_LO, ZDOC_LEN_HI = 150, 300   # n_chars spans ~48-550


def _zdoc_layout(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Documents (+ the dedup_exact-style planted twins, so the
    scoped dedup below has real nonzero groups) rewritten on the
    Morton curve of (source number, n_chars) — ONE home for the
    layout build, shared by the registry entry and the footer-stats
    skip test."""
    from last_minute_legends_spark.sources.zorder import write_zordered

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", "text", "source", "n_chars")
    # plant mod 7, NOT 10: source = src{doc_id % 20}, so a mod-10
    # plant only ever twins src0/src10 docs — none inside the src 4-7
    # band (0 groups, vacuous oracle — measured); 7 is coprime with 20
    # and reaches every source
    planted = docs.filter(F.col("doc_id") % 7 == 0).crossJoin(
        _plant_offset(docs, "doc_id")
    ).select(
        (F.col("doc_id") + F.col("_plant_off")).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.col("text"))).alias("text"),
        "source",
        (F.length(F.concat(F.lit("  "), F.upper(F.col("text"))))
         .cast("long")).alias("n_chars"),
    )
    allv = docs.unionByName(planted).withColumn(
        "src_num", F.substring("source", 4, 10).cast("long"))
    write_zordered(allv, path, "src_num", "n_chars")


def zorder_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ordered DOCUMENTS for the dedup/curation read path: the
    zorder_events 2-D skipping story applied to the corpus the dedup
    family always full-scans. Clustering on (source, n_chars) makes
    every file's footer stats tight on BOTH axes, so the scoped reads
    real pipelines run constantly — dedup within one source, quality
    passes over a length band, source-scoped recuration — skip most
    files from stats alone (skip fraction measured from the actual
    parquet footers in tests/test_operators.py::
    test_zorder_documents_skipping).

    The query is exactly such a read: exact-dedup keeper election
    over one source band AND one length band of the rewritten corpus
    (planted case/whitespace twins de-vacuize, the dedup_exact
    pattern — a twin shares its original's source and lands 2 chars
    longer, inside the band). The oracle replays filter + grouping
    from the base table, so content preservation through the Morton
    rewrite and the scope semantics are both value-checked."""
    import atexit
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="llm_spark_zdoc_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    path = f"{tmp}/documents_z"
    _zdoc_layout(spark, sf_dir, path)
    z = spark.read.parquet(path)
    scoped = z.filter(
        F.col("src_num").between(ZDOC_SRC_LO, ZDOC_SRC_HI)
        & F.col("n_chars").between(ZDOC_LEN_LO, ZDOC_LEN_HI))
    return exact_duplicates(scoped).orderBy("fp")


ZORDER_DOCUMENTS_SQL = f"""
WITH base AS (
    SELECT doc_id, text, source, n_chars FROM documents
), planted AS (
    SELECT doc_id + (SELECT max(doc_id) + 1 FROM base) AS doc_id,
           '  ' || upper(text) AS text, source,
           CAST(length('  ' || upper(text)) AS BIGINT) AS n_chars
    FROM base WHERE doc_id % 7 = 0
), allv AS (
    SELECT * FROM base UNION ALL SELECT * FROM planted
), scoped AS (
    SELECT * FROM allv
    WHERE CAST(substr(source, 4) AS BIGINT)
              BETWEEN {ZDOC_SRC_LO} AND {ZDOC_SRC_HI}
      AND n_chars BETWEEN {ZDOC_LEN_LO} AND {ZDOC_LEN_HI}
)
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       count(*) AS n_docs, min(doc_id) AS keeper_doc_id
FROM scoped GROUP BY fp HAVING count(*) > 1
ORDER BY fp
"""


DELTA_MOD = 5  # every 5th doc is "the new epoch" in the registry entry


def dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH dedup (operators/dedup_delta.py): the
    corpus is split into an already-indexed base (doc_id % 5 != 0)
    and a freshly-ingested epoch (doc_id % 5 == 0); the base's LSH
    band-bucket table and pair set are materialized ONCE per corpus
    fingerprint (sources/layout_cache.py — the write-once
    ivf-index economics, so min-of-2 bench cells converge on
    absorb-only cost) and the epoch is absorbed against them:
    delta-sized signature work, size-gated planning-literal probes
    into the persisted buckets, candidate-only re-shingling for the
    exact verify.

    Uses the portable md5 hashes, so the DuckDB oracle is the
    UNCHANGED single-shot replay SQL over the full corpus
    (DEDUP_MINHASH_REPLAY_SQL): the value hash matching proves the
    incremental decomposition (stored base×base pairs ∪ index-probed
    delta×base ∪ self-joined delta×delta) is lossless — the
    incremental_distinct oracle pattern applied to dedup. The
    production-xxhash64 form is semantics-identical
    (tests/test_dedup_delta.py locks injected-vs-production parity,
    epoch chaining, and byte-identity of pre-existing bucket files
    under append)."""
    from last_minute_legends_spark.functions.portable_hash import (
        concat_band_key, md5_perm_hash,
    )
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_delta, write_band_index,
    )
    from last_minute_legends_spark.sources import layout_cache

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % DELTA_MOD != 0)
    delta = docs.filter(F.col("doc_id") % DELTA_MOD == 0)
    idx = layout_cache.layout_dir(
        "dedup_band_index",
        os.path.join(sf_dir, "documents.parquet"),
        f"v1-md5-mod{DELTA_MOD}-t{JACCARD_THRESHOLD}")
    layout_cache.build_once(idx, lambda tmp: write_band_index(
        base, tmp, JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key))
    # read-only absorb (append=False): the cached layout is shared
    # across calls/processes, so the query must not mutate it — the
    # append lifecycle is exercised on private copies in tests.
    # Eagerly materialize the (small) pair frame, then release the
    # absorb's internal persists: the driver runs 116 entries through
    # one session, so leaked persists accumulate executor storage
    # across the sweep (VERDICT r16 #6)
    from last_minute_legends_spark.operators.dedup_delta import (
        release_absorb_persists,
    )

    out = absorb_delta(
        spark, base, delta, idx, JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
        append=False,
    ).orderBy("doc_a", "doc_b").localCheckpoint(eager=True)
    release_absorb_persists()
    return out


def stream_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-dedup lifecycle on the STREAMING ingest path
    (streaming/pipeline.py::run_stream_dedup_delta): a quarter of the
    corpus seeds the band-bucket index, the other three quarters
    arrive as a JSON file-stream topic one epoch per micro-batch, and
    ``foreachBatch`` absorbs each epoch against the persisted layout
    — delta-sized signatures, bucket probes, verify against the
    corpus landed so far, add-only appends, a band-index health check
    every few epochs. The reference's own core loop
    (spark_batch_processor.py:83-86 incremental new-record detection
    before publish) upgraded from exact-id diff to near-dup semantics
    on a streaming source. Portable md5 hashes → the final stored
    pair set equals the single-shot run over the full corpus, so the
    oracle is the UNCHANGED single-shot replay SQL; production
    xxhash64 parity is locked in tests/test_dedup_delta.py."""
    from last_minute_legends_spark.functions.portable_hash import (
        concat_band_key, md5_perm_hash,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_dedup_delta,
    )

    # 4 epochs restored (VERDICT r15 #4): the dominant per-epoch cost
    # was the band append's dynamic-partition write fanning every
    # input split across every touched (band, bvb) dir — measured
    # 8.7 s and ~32 files/dir per epoch at sf0.1; repartitioned +
    # bv-sorted (operators/dedup_delta.py append paths) a warm epoch
    # absorbs in 6.6-8.1 s and adds ONE file per touched dir
    return run_stream_dedup_delta(
        spark, sf_dir, n_epochs=4, threshold=JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
        cache_tag="md5",
    ).orderBy("doc_a", "doc_b")


def dedup_clusters_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL cluster maintenance (r16): the delta lifecycle run
    END-TO-END — pairs AND keeper labels maintained per epoch. The
    base corpus' band index + pair set come from the shared cached
    layout (the dedup_delta build); its cluster labels are computed
    once from the stored pairs; the epoch absorbs (delta-sized pair
    work), and the NEW pairs fold into the labels via
    operators/dedup_delta.py::merge_cluster_labels — iterative CC
    runs only on the epoch-sized CONTRACTED graph (touched labels ×
    new pairs), never on accumulated history; the corpus-sized labels
    table is mapped once through a broadcast merge map.

    Value-identical to single-shot connected_components over the full
    pair graph (merge == single-shot locked in
    tests/test_dedup_delta.py), so the oracle recomputes the ENTIRE
    transitive closure from scratch over the md5 replay pair graph —
    any leak in the contraction (a missed merge, a stale label, a
    dropped singleton pair) breaks the value hash."""
    from last_minute_legends_spark.functions.portable_hash import (
        concat_band_key, md5_perm_hash,
    )
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_delta, stored_pairs,
        write_band_index,
    )
    from last_minute_legends_spark.sources import layout_cache

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % DELTA_MOD != 0)
    delta = docs.filter(F.col("doc_id") % DELTA_MOD == 0)
    idx = layout_cache.layout_dir(
        "dedup_band_index",
        os.path.join(sf_dir, "documents.parquet"),
        f"v1-md5-mod{DELTA_MOD}-t{JACCARD_THRESHOLD}")
    layout_cache.build_once(idx, lambda tmp: write_band_index(
        base, tmp, JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key))
    stored = stored_pairs(spark, idx)
    # the labels ARE the maintained state a deployment persists
    # between epochs — cached per corpus fingerprint as the
    # BUCKET-PARTITIONED store (operators/labels_store.py, r17): the
    # fold's relabel reads only the bucket partitions holding a
    # merge-map key (planning-time lbk IN (...)), so per-epoch label
    # I/O is epoch-sized, not corpus-sized (VERDICT r16 #1). The
    # shared cache is read-only, so the merge runs write=False (the
    # absorb append=False discipline); the touched-buckets-only
    # REWRITE path is locked by tests/test_labels_store.py and
    # measured by the dedup_clusters_delta ladder cells.
    from last_minute_legends_spark.operators.labels_store import (
        merge_labels_store, write_labels_store,
    )

    lab_dir = layout_cache.layout_dir(
        "dedup_base_labels",
        os.path.join(sf_dir, "documents.parquet"),
        f"v4-store-md5-mod{DELTA_MOD}-t{JACCARD_THRESHOLD}")
    layout_cache.build_once(lab_dir, lambda tmp: write_labels_store(
        connected_components(stored_pairs(spark, idx)), tmp))
    full = absorb_delta(
        spark, base, delta, idx, JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
        append=False)
    # persist: new_edges carries the whole absorb verify DAG and the
    # merge consumes it three times (node extraction + both label
    # lookups) — unpersisted, the absorb re-executes per consumer
    new_edges = full.join(stored.select("doc_a", "doc_b"),
                          ["doc_a", "doc_b"], "left_anti").persist()
    # eager materialize, then release every pinned frame (VERDICT
    # r16 #6: persists leaked across the driver's 116-entry sweep)
    from last_minute_legends_spark.operators.dedup_delta import (
        release_absorb_persists,
    )

    out = (merge_labels_store(spark, lab_dir, new_edges, write=False)
           .withColumnRenamed("id", "doc_id").orderBy("doc_id")
           .localCheckpoint(eager=True))
    new_edges.unpersist()
    release_absorb_persists()
    return out


def stream_clusters_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained keeper labels on the STREAMING ingest path (r16):
    run_stream_dedup_delta with ``maintain_labels=True`` — base
    labels seeded from the cached band index's pair graph, then each
    micro-batch's absorb folds every stored pair touching the
    epoch's doc ids into the label state via the contracted-graph
    merge (already-connected edges merge as no-ops, which is what
    makes crash/redelivery converge instead of skipping merges; r17:
    labels persist in the bucket-partitioned store — in-place
    confluent folds, touched-buckets-only rewrite, VERDICT r16 #1 —
    so a redelivered epoch is a byte-level no-op). The final
    labels equal single-shot connected_components over the full
    corpus' pair graph, so the oracle is the SAME full
    recursive-closure SQL as the batch incremental entry
    (DEDUP_CLUSTERS_DELTA_SQL) — one more lifecycle value-checked
    end-to-end from a stream."""
    from last_minute_legends_spark.functions.portable_hash import (
        concat_band_key, md5_perm_hash,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_dedup_delta,
    )

    return (run_stream_dedup_delta(
        spark, sf_dir, n_epochs=4, threshold=JACCARD_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
        cache_tag="md5", maintain_labels=True)
        .withColumnRenamed("id", "doc_id").orderBy("doc_id"))


_SHINGLES_CTE = r"""
tok AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
    FROM tok, UNNEST(generate_series(1, len(w) - 2)) t(i)
)"""


def banded_lsh_replay_sql(pair_pred: str, a_name: str, b_name: str,
                          threshold: float) -> str:
    """From-scratch DuckDB replay of the banded-LSH pipeline with the
    portable hash: shingles → per-permutation min-hashes → band keys
    → length-filtered candidate join → exact-Jaccard verify. Every
    intermediate (signature words, band values, the candidate set)
    must agree with Spark's for the final frame to value-match.

    ONE home for the shingle/signature/band CTE generators —
    parameterized by the candidate-pair predicate and output names so
    the symmetric all-pairs oracle (``a.doc_id < b.doc_id`` →
    doc_a/doc_b) and the asymmetric fuzzy-decontamination oracle
    (train×eval split → doc_id/ref_doc_id,
    plans/curation_q.py::_fuzzy_decont_sql) cannot drift apart — the
    SQL mirror of the Spark-side ``_signature_bands`` sharing."""
    from last_minute_legends_spark.functions.portable_hash import duck_hash60
    from last_minute_legends_spark.operators.dedup import (
        N_BANDS, N_PERM, ROWS_PER_BAND,
    )

    mins = ", ".join(
        "min({h}) AS h{i}".format(h=duck_hash60("s || ':{}'".format(i)), i=i)
        for i in range(N_PERM)
    )
    band_selects = "\n    UNION ALL ".join(
        "SELECT doc_id, n_sh, {b} AS band, {bv} AS bv FROM sig".format(
            b=b,
            bv=" || '|' || ".join(
                f"h{b * ROWS_PER_BAND + r}::VARCHAR"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
WITH {_SHINGLES_CTE},
sig AS (
    SELECT doc_id, count(*) AS n_sh, {mins}
    FROM sh GROUP BY doc_id
), bands AS (
    {band_selects}
), cand AS (
    SELECT DISTINCT a.doc_id AS {a_name}, b.doc_id AS {b_name},
           a.n_sh AS na, b.n_sh AS nb
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND {pair_pred}
     AND least(a.n_sh, b.n_sh) >= {threshold} * greatest(a.n_sh, b.n_sh) - 1e-9
), inter AS (
    SELECT cand.{a_name}, {b_name}, na, nb, count(*) AS inter
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.{a_name}
    JOIN sh sb ON sb.doc_id = cand.{b_name} AND sa.s = sb.s
    GROUP BY 1, 2, 3, 4
)
SELECT {a_name}, {b_name},
       round(inter / (na + nb - inter), 4) AS jaccard
FROM inter
WHERE inter / (na + nb - inter) >= {threshold}
ORDER BY {a_name}, {b_name}
"""


def _minhash_replay_sql() -> str:
    return banded_lsh_replay_sql(
        "a.doc_id < b.doc_id", "doc_a", "doc_b", JACCARD_THRESHOLD)


DEDUP_MINHASH_REPLAY_SQL = _minhash_replay_sql()


def _clusters_delta_sql() -> str:
    """Full-from-scratch oracle for the INCREMENTAL cluster entry:
    the md5 replay pair pipeline (shared generator above) feeding the
    recursive min-label transitive closure — the single-shot twin of
    what merge_cluster_labels maintains epoch-at-a-time."""
    inner = DEDUP_MINHASH_REPLAY_SQL.rsplit("ORDER BY", 1)[0]
    return f"""
WITH RECURSIVE pairs AS (
    SELECT doc_a, doc_b FROM ({inner}) rp
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
), nodes AS (
    SELECT DISTINCT src AS id FROM edges
), reach(id, lab) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lab) AS cluster_id
FROM reach GROUP BY id ORDER BY doc_id
"""


DEDUP_CLUSTERS_DELTA_SQL = _clusters_delta_sql()

SIMHASH_MAX_HAMMING = 3


def dedup_simhash_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_simhash`` with the portable md5-prefix token hash
    injected (functions/portable_hash.py) and the gate-stable 64-bit
    signature — the SAME operator code and plan shape (distinct token
    hashes → per-bit majority vote → 4x16 bands → hamming-verified
    pairs), but with a hash DuckDB computes bit-for-bit, so the
    driver gate value-checks every arithmetic step of the simhash
    pipeline (signature bits, band keys, the candidate set, the exact
    hamming distances) instead of a rows-only count — the r12
    minhash/IVF replay-twin pattern applied to the last banding
    family without a driver-side value check. Injected-vs-production
    parity and the 128-bit variant stay locked in
    tests/test_hash_replay.py."""
    from last_minute_legends_spark.functions.portable_hash import (
        md5_hash60,
    )

    docs = Catalog(spark, sf_dir).documents
    return simhash_pairs(docs, max_hamming=SIMHASH_MAX_HAMMING,
                         token_hash=md5_hash60, n_bits=64).orderBy(
        "doc_a", "doc_b")


def _simhash_replay_sql() -> str:
    """From-scratch DuckDB replay of the 64-bit simhash pipeline with
    the portable hash: distinct tokens → 60-bit hashes → per-bit
    majority signature → 4x16-bit band join → hamming verify. Every
    intermediate must agree with Spark's for the final frame to
    value-match."""
    from last_minute_legends_spark.functions.portable_hash import (
        duck_hash60,
    )

    csum = ", ".join(f"sum((h >> {b}) & 1) AS c{b}" for b in range(64))
    majority = " | ".join(
        f"(CASE WHEN 2 * c{b} > n THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(64)
    )
    return f"""
WITH tokd AS (
    SELECT DISTINCT doc_id, t
    FROM (
        SELECT doc_id,
               unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS t
        FROM documents
    )
), h AS (
    SELECT doc_id, {duck_hash60('t')} AS h FROM tokd
), sums AS (
    SELECT doc_id, count(*) AS n, {csum} FROM h GROUP BY doc_id
), sig AS (
    SELECT doc_id, ({majority}) AS simhash FROM sums
), bands AS (
    SELECT doc_id, simhash, k AS band,
           (simhash >> (16 * k)) & 65535 AS bv
    FROM sig, UNNEST([0, 1, 2, 3]) t(k)
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming
FROM pairs WHERE hamming <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


DEDUP_SIMHASH_REPLAY_SQL = _simhash_replay_sql()


SUBSTRING_K = 8


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2021), k=8 words.
    De-vacuization plant (the dedup_exact pattern): every 20th doc
    gets a companion (id offset max+1) whose text is the doc's first 12 words
    plus a unique tail, so the corpus is guaranteed to contain known
    cross-doc duplicated prefixes whatever the synthetic generator
    does — the oracle plants identically, so span boundaries, island
    merging, and ratios are all value-compared on real nonzero
    output."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    from last_minute_legends_spark.functions.text import words

    w = words(F.col("text"))
    planted = docs.filter(
        (F.col("doc_id") % 20 == 0) & (F.size(w) >= 12)
    ).crossJoin(_plant_offset(docs, "doc_id")).select(
        (F.col("doc_id") + F.col("_plant_off")).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(w, 1, 12), " "),
            F.lit(" uniquetail"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return duplicated_spans(docs.unionByName(planted), k=SUBSTRING_K)


DEDUP_SUBSTRING_SQL = f"""
WITH base AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), planted AS (
    SELECT doc_id + (SELECT max(doc_id) + 1 FROM base) AS doc_id,
           list_concat(w[1:12],
                       ['uniquetail' || doc_id::VARCHAR]) AS w
    FROM base WHERE doc_id % 20 = 0 AND len(w) >= 12
), allv AS (
    SELECT doc_id, w FROM base UNION ALL SELECT doc_id, w FROM planted
), occ AS (
    SELECT doc_id, len(w) AS tot, i AS p,
           array_to_string(w[i:i + {SUBSTRING_K} - 1], ' ') AS s
    FROM allv, UNNEST(generate_series(1, len(w) - {SUBSTRING_K} + 1)) t(i)
    WHERE len(w) >= {SUBSTRING_K}
), dup AS (
    SELECT doc_id, tot, p FROM (
        SELECT *, count(*) OVER (PARTITION BY s) AS c FROM occ
    ) WHERE c > 1
), marked AS (
    SELECT doc_id, tot, p,
           CASE WHEN p > coalesce(max(p + {SUBSTRING_K} - 1) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                THEN 1 ELSE 0 END AS is_new
    FROM dup
), islands AS (
    SELECT doc_id, tot, p,
           sum(is_new) OVER (PARTITION BY doc_id ORDER BY p) AS island
    FROM marked
), spans AS (
    SELECT doc_id, tot, island,
           min(p) AS st, max(p + {SUBSTRING_K} - 1) AS en
    FROM islands GROUP BY doc_id, tot, island
)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       sum(en - st + 1)::BIGINT AS dup_tokens,
       tot::BIGINT AS total_tokens,
       round(sum(en - st + 1)::DOUBLE / tot, 4) AS dup_ratio
FROM spans GROUP BY doc_id, tot ORDER BY doc_id
"""


def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repair half of Lee-et-al substring dedup over the same
    planted corpus as dedup_substring: non-first occurrences of
    duplicated k-word windows are cut and the text rebuilt, so the
    oracle value-compares the full cleaned corpus — span boundaries,
    keep-first election, and the rebuilt strings themselves."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    from last_minute_legends_spark.functions.text import words

    w = words(F.col("text"))
    planted = docs.filter(
        (F.col("doc_id") % 20 == 0) & (F.size(w) >= 12)
    ).crossJoin(_plant_offset(docs, "doc_id")).select(
        (F.col("doc_id") + F.col("_plant_off")).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(w, 1, 12), " "),
            F.lit(" uniquetail"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return remove_duplicated_spans(docs.unionByName(planted),
                                   k=SUBSTRING_K)


DEDUP_SUBSTRING_CLEAN_SQL = f"""
WITH base AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), planted AS (
    SELECT doc_id + (SELECT max(doc_id) + 1 FROM base) AS doc_id,
           list_concat(w[1:12],
                       ['uniquetail' || doc_id::VARCHAR]) AS w
    FROM base WHERE doc_id % 20 = 0 AND len(w) >= 12
), allv AS (
    SELECT doc_id, w FROM base UNION ALL SELECT doc_id, w FROM planted
), occ AS (
    SELECT doc_id, len(w) AS tot, i AS p,
           array_to_string(w[i:i + {SUBSTRING_K} - 1], ' ') AS s
    FROM allv, UNNEST(generate_series(1, len(w) - {SUBSTRING_K} + 1)) t(i)
    WHERE len(w) >= {SUBSTRING_K}
), removable AS (
    SELECT doc_id, tot, p FROM (
        SELECT *, count(*) OVER (PARTITION BY s) AS c,
               row_number() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
        FROM occ
    ) WHERE c > 1 AND rn > 1
), marked AS (
    SELECT doc_id, tot, p,
           CASE WHEN p > coalesce(max(p + {SUBSTRING_K} - 1) OVER (
                    PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                THEN 1 ELSE 0 END AS is_new
    FROM removable
), islands AS (
    SELECT doc_id, tot, p,
           sum(is_new) OVER (PARTITION BY doc_id ORDER BY p) AS island
    FROM marked
), spans AS (
    SELECT doc_id, tot, island,
           min(p) AS st, max(p + {SUBSTRING_K} - 1) AS en
    FROM islands GROUP BY doc_id, tot, island
), covered AS (
    SELECT doc_id, u.p FROM spans, UNNEST(generate_series(st, en)) u(p)
), tok AS (
    SELECT doc_id, len(w) AS tot, i AS p, w[i] AS t
    FROM allv, UNNEST(generate_series(1, len(w))) t(i)
), kept AS (
    SELECT tok.doc_id, tok.tot, tok.p, tok.t
    FROM tok LEFT JOIN covered
      ON tok.doc_id = covered.doc_id AND tok.p = covered.p
    WHERE covered.p IS NULL
), rebuilt AS (
    SELECT doc_id, tot, count(*) AS kept_n,
           string_agg(t, ' ' ORDER BY p) AS clean_text
    FROM kept GROUP BY doc_id, tot
)
SELECT a.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       (a.tot - coalesce(r.kept_n, 0))::BIGINT AS removed_tokens,
       a.tot::BIGINT AS total_tokens
FROM (SELECT doc_id, len(w) AS tot FROM allv) a
LEFT JOIN rebuilt r ON a.doc_id = r.doc_id
ORDER BY a.doc_id
"""


SPARK = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_lsh_replay": dedup_minhash_lsh_replay,
    "dedup_delta": dedup_delta,
    "dedup_clusters_delta": dedup_clusters_delta,
    "stream_clusters_delta": stream_clusters_delta,
    "stream_dedup_delta": stream_dedup_delta,
    "zorder_documents": zorder_documents,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_replay": dedup_simhash_replay,
    "dedup_embedding": dedup_embedding,
    "dedup_semantic": dedup_semantic,
    "dedup_semantic_delta": dedup_semantic_delta,
    "stream_semantic_delta": stream_semantic_delta,
    "dedup_embedding_delta": dedup_embedding_delta,
    "stream_embedding_delta": stream_embedding_delta,
    "dedup_clusters": dedup_clusters,
    "dedup_substring": dedup_substring,
    "dedup_substring_clean": dedup_substring_clean,
}

LOCAL_SQL = {}

SQL = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh": None,   # xxhash64 banding: rows-only check
    # r12: the portable-hash twin gives the LSH family its first
    # DRIVER-side value check (the same replay tests/test_hash_replay.py
    # ran locally since r7, now registered with full ORACLE_SQL)
    "dedup_minhash_lsh_replay": DEDUP_MINHASH_REPLAY_SQL,
    # r15: incremental absorb vs the SAME single-shot SQL — the hash
    # matching is what proves the delta decomposition lossless
    "dedup_delta": DEDUP_MINHASH_REPLAY_SQL,
    # r15: the streaming-ingest form converges on the identical final
    # pair set — same single-shot oracle, absorbed epoch-at-a-time
    "stream_dedup_delta": DEDUP_MINHASH_REPLAY_SQL,
    # r16: maintained keeper labels — oracle recomputes the entire
    # transitive closure from scratch over the replay pair graph
    "dedup_clusters_delta": DEDUP_CLUSTERS_DELTA_SQL,
    # r16: the same labels maintained per MICRO-BATCH on the
    # streaming path — identical final state, same full oracle
    "stream_clusters_delta": DEDUP_CLUSTERS_DELTA_SQL,
    # r15: scoped dedup over the Morton-rewritten corpus — content
    # preservation + 2-D scope semantics value-checked from base
    "zorder_documents": ZORDER_DOCUMENTS_SQL,
    "dedup_simhash": None,       # simhash banding: rows-only check
    # r13: the portable-hash twin gives the SIMHASH family its first
    # DRIVER-side value check (the replay tests/test_hash_replay.py
    # ran locally since r7, now registered with full ORACLE_SQL)
    "dedup_simhash_replay": DEDUP_SIMHASH_REPLAY_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    # r17: SemDeDup — full train→assign→prune derivation replayed
    # (unrolled Lloyd via the shared _lloyd_ctes chain)
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    # r17b: frozen-geometry incremental form — base-only Lloyd,
    # assign-all, same prune tail
    "dedup_semantic_delta": DEDUP_SEMANTIC_DELTA_SQL,
    # r17b: the streaming form converges on the identical final
    # verdict frame — same frozen-geometry oracle
    "stream_semantic_delta": DEDUP_SEMANTIC_DELTA_SQL,
    # r16: incremental absorb vs the SAME exact all-pairs SQL — the
    # hash match proves frozen-plane recall AND the delta
    # decomposition lossless (the dedup_delta oracle pattern on the
    # embedding tier)
    "dedup_embedding_delta": DEDUP_EMBEDDING_SQL,
    # r17: the streaming form chains the same frozen-plane absorbs —
    # same exact all-pairs oracle, recall at the seed geometry proven
    # by the hash match
    "stream_embedding_delta": DEDUP_EMBEDDING_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    # r11-new: in the gate window for their first external
    # observation (two long-green OLAP lenders moved to LOCAL_SQL —
    # rationale at plans/olap.py SQL map)
    "dedup_substring": DEDUP_SUBSTRING_SQL,
    "dedup_substring_clean": DEDUP_SUBSTRING_CLEAN_SQL,
}
