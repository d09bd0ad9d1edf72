"""Similarity-search queries over the ``embeddings`` table (SURVEY §2.4).

Query set: vec_id < 5 (broadcast side); candidates: vec_id >= 5.
Brute force is the oracle-checked exact baseline; IVF probes the
2 nearest of 8 Lloyd-trained centroids (deterministic k-means —
id-striped seeds, 3 iterations, no RNG) and is rows-only checked,
with recall >= 0.9 vs brute force asserted in tests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.operators.similarity import (
    brute_topk,
    dequantize,
    ivf_topk,
    quantize_int8,
    train_centroids,
    with_unit_vectors,
)
from last_minute_legends_spark.sources.tables import Catalog, spread_cpu_scan

TOP_K = 10
N_QUERIES = 5
N_CENTROIDS = 8


def _vectors(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    """Unit-normalized embeddings. ``spread=True`` round-robins the
    under-split scan first — used by the multi-pass (Lloyd training)
    and per-row-transform-heavy (quantize) entries; brute force stays
    on the plain scan (its per-row work is one broadcast-side dot
    product and the exchange measured 2.2x slower in r6)."""
    emb = Catalog(spark, sf_dir).embeddings
    if spread:
        emb = spread_cpu_scan(spark, emb)
    return with_unit_vectors(emb)


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vectors(spark, sf_dir)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES)
    return brute_topk(queries, candidates, k=TOP_K).orderBy("q_id", "rn")


ANN_BRUTEFORCE_SQL = f"""
WITH n AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
    FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
), ranked AS (
    SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
    FROM scored
)
SELECT q_id, rn, c_id, round(cos, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES)
    centroids = train_centroids(candidates, k=N_CENTROIDS, iters=3)
    return ivf_topk(queries, candidates, centroids, k=TOP_K, n_probe=2).orderBy(
        "q_id", "rn"
    )


IVF_ITERS = 3
IVF_N_PROBE = 2
# frozen-centroid ingest delta (ann_ivf_append_probe): every
# APPEND_MOD-th embedding, first-dimension-perturbed and re-keyed past
# max(vec_id) — deterministic, identically derived in the oracle
APPEND_MOD = 10
APPEND_EPS = 0.05


def ann_ivf_topk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_ivf_topk`` with the portable md5-prefix id hash injected
    (functions/portable_hash.py) in place of the production xxhash64
    seed striping — the SAME train_centroids → ivf_topk code, so the
    driver's DuckDB gate value-replays the ENTIRE derivation (seed
    selection → 3 Lloyd iterations → 2-probe bucket selection →
    in-bucket exact top-k) via the unrolled-CTE oracle below instead
    of a rows-only count. ``local_train_max=0`` forces the
    distributed Lloyd loop, the path the replay exists to check
    (test_ivf_local_matches_distributed locks the local branch to
    it); injected-vs-production parity is locked by
    tests/test_ivf_replay.py."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES)
    centroids = train_centroids(candidates, k=N_CENTROIDS, iters=IVF_ITERS,
                                id_hash=md5_id_hash, local_train_max=0)
    return ivf_topk(queries, candidates, centroids,
                    k=TOP_K, n_probe=IVF_N_PROBE).orderBy("q_id", "rn")


_IVF_DH = "('0x' || substr(md5(id::VARCHAR), 1, 15))::UBIGINT::BIGINT"
_IVF_COS = "list_dot_product({a}.v, {b}.cv) / ({a}.nrm * {b}.cn)"


def _ivf_assign_cte(name: str, cent: str, src: str = "cand") -> str:
    """Argmax-cosine bucket per ``src`` vector against centroid set
    ``cent`` — row_number on (cos DESC, cent_id ASC) matches the
    Spark fold's strict-> earliest-wins tiebreak."""
    cos = _IVF_COS.format(a="c", b="ct")
    return f"""{name} AS MATERIALIZED (
    SELECT id, v, nrm, bucket FROM (
        SELECT c.id, c.v, c.nrm, ct.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY c.id
                   ORDER BY {cos} DESC, ct.cent_id) AS rn
        FROM {src} c CROSS JOIN {cent} ct
    ) WHERE rn = 1
)"""


def _lloyd_ctes(src: str, k: int, iters: int, prefix: str = "") -> list[str]:
    """The unrolled deterministic Lloyd derivation as a reusable CTE
    chain over ``src`` (an (id, v, nrm) relation): id-stripe seed
    selection (``{prefix}cent0``) → ``iters`` iterations of
    argmax-cosine assignment → 8-dp per-dimension bucket means → norm
    re-form (empty buckets keep their centroid), ending in
    ``{prefix}cent{iters}``. Shared verbatim by the IVF replay, the
    per-subspace PQ replay, the IVF-PQ composition, and the semantic
    dedup oracle (plans/dedup_q.py) — one training derivation,
    replayed wherever train_centroids is the Spark-side model."""
    parts = [f"""{prefix}cent0 AS MATERIALIZED (
    SELECT bucket AS cent_id, arg_min(v, id) AS cv, arg_min(nrm, id) AS cn
    FROM (SELECT id, v, nrm, {_IVF_DH} % {k} AS bucket FROM {src})
    GROUP BY bucket
)"""]
    for i in range(1, iters + 1):
        parts.append(_ivf_assign_cte(f"{prefix}assign{i}",
                                     f"{prefix}cent{i - 1}", src=src))
        parts.append(f"""{prefix}means{i} AS MATERIALIZED (
    SELECT bucket, list(m ORDER BY pos) AS mv
    FROM (
        SELECT bucket, pos, round(avg(v[pos]), 8) AS m
        FROM {prefix}assign{i}, UNNEST(generate_series(1, len(v))) t(pos)
        GROUP BY bucket, pos
    ) GROUP BY bucket
)""")
        parts.append(f"""{prefix}cent{i} AS MATERIALIZED (
    SELECT ct.cent_id,
           coalesce(m.mv, ct.cv) AS cv,
           CASE WHEN m.mv IS NULL THEN ct.cn
                ELSE sqrt(list_dot_product(m.mv, m.mv)) END AS cn
    FROM {prefix}cent{i - 1} ct LEFT JOIN {prefix}means{i} m ON m.bucket = ct.cent_id
)""")
    return parts


def _ivf_replay_sql(with_append_delta: bool = False) -> str:
    """From-scratch DuckDB unroll of the full IVF derivation (the
    BPE-oracle pattern): id-stripe seed selection → IVF_ITERS Lloyd
    iterations of (argmax-cosine assignment → 8-dp per-dimension
    bucket means → norm re-form, empty buckets keep their centroid) →
    per-query IVF_N_PROBE bucket selection → in-bucket exact cosine
    top-k. Dot products sum left-to-right on both engines
    (functions/vectors.py ≙ list_dot_product); ties break on lowest
    centroid/candidate id on both."""
    parts = [f"""n AS MATERIALIZED (
    SELECT vec_id AS id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), qry AS MATERIALIZED (SELECT * FROM n WHERE id < {N_QUERIES}),
cand AS MATERIALIZED (SELECT * FROM n WHERE id >= {N_QUERIES})"""]
    parts.extend(_lloyd_ctes("cand", N_CENTROIDS, IVF_ITERS))
    parts.append(_ivf_assign_cte("bucketed", f"cent{IVF_ITERS}"))
    search_side = "bucketed"
    if with_append_delta:
        # frozen-centroid ingest: re-keyed perturbed vectors assigned
        # against the FINAL trained centroids (never re-entering the
        # Lloyd loop — exactly what append_ivf_index does), unioned
        # into the searched set
        parts.append(f"""dn AS MATERIALIZED (
    SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS id,
           list_concat([v0[1] + {APPEND_EPS}], v0[2:]) AS v
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings
          WHERE vec_id % {APPEND_MOD} = 0)
), delta AS MATERIALIZED (
    SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM dn
)""")
        parts.append(_ivf_assign_cte("delta_assigned", f"cent{IVF_ITERS}",
                                     src="delta"))
        parts.append("""all_bucketed AS MATERIALIZED (
    SELECT * FROM bucketed UNION ALL SELECT * FROM delta_assigned
)""")
        search_side = "all_bucketed"
    qcos = _IVF_COS.format(a="q", b="ct")
    parts.append(f"""probes AS MATERIALIZED (
    SELECT q_id, bucket FROM (
        SELECT q.id AS q_id, ct.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY q.id
                   ORDER BY {qcos} DESC, ct.cent_id) AS rn
        FROM qry q CROSS JOIN cent{IVF_ITERS} ct
    ) WHERE rn <= {IVF_N_PROBE}
)""")
    return "WITH " + ",\n".join(parts) + f""",
scored AS (
    SELECT p.q_id, b.id AS c_id,
           list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS cos
    FROM probes p
    JOIN {search_side} b ON b.bucket = p.bucket
    JOIN qry q ON q.id = p.q_id
), ranked AS (
    SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, c_id) AS rn
    FROM scored
)
SELECT q_id, rn, c_id, round(cos, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


ANN_IVF_REPLAY_SQL = _ivf_replay_sql()


# --- write-time partitioned IVF index (VERDICT r11 #3) -------------
#
# Centroid count scales with the corpus (k ≈ n / TARGET_BUCKET_ROWS)
# so bucket size — and therefore probe cost — stays CONSTANT as the
# corpus grows; training is bounded by a deterministic id-hash sample
# once the corpus passes TRAIN_SAMPLE_MAX. At the driver's sf0.01
# (495 candidates) both knobs are inactive (k = 8, no sampling), so
# the entry reduces to EXACTLY the ann_ivf_topk_replay derivation and
# shares its full unrolled-Lloyd value oracle.
IVF_INDEX_VERSION = "v1"
TARGET_BUCKET_ROWS = 2_048
TRAIN_SAMPLE_MAX = 32_768


def _index_dir(sf_dir: str) -> str:
    from last_minute_legends_spark.sources import layout_cache

    return layout_cache.layout_dir(
        "llm_spark_ivf_index", os.path.join(sf_dir, "embeddings.parquet"),
        IVF_INDEX_VERSION)


def _build_ivf_layout(spark: SparkSession, sf_dir: str, idx: str,
                      post_write=None) -> str:
    """Shared build body for the probe entries' cached index layouts:
    scale-aware k and training-sample policy (ONE home for both
    formulas — the probe-indexed and append twins must measure the
    same index geometry), train, write, params dump, mark built.
    ``post_write(index_root_dir)`` runs between the write and the
    params dump (it receives the same path write_ivf_index wrote —
    the layout ROOT holding data/ and centroids/); the append twin
    ingests its delta there."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.ivf_index import write_ivf_index

    if layout_cache.is_built(idx):
        return idx

    def _build(tmp: str) -> None:
        vecs = _vectors(spark, sf_dir, spread=True)
        candidates = vecs.filter(F.col("id") >= N_QUERIES)
        n = candidates.count()
        k = max(N_CENTROIDS, n // TARGET_BUCKET_ROWS)
        sample_mod = (-(-n // TRAIN_SAMPLE_MAX)
                      if n > TRAIN_SAMPLE_MAX else None)
        centroids = train_centroids(candidates, k=k, iters=IVF_ITERS,
                                    sample_mod=sample_mod,
                                    id_hash=md5_id_hash)
        write_ivf_index(candidates, centroids, tmp)
        if post_write is not None:
            post_write(tmp)
        with open(os.path.join(tmp, _IVF_PARAMS), "w") as fh:
            json.dump({"n": n, "k": k, "sample_mod": sample_mod}, fh)

    # concurrency-safe rename-into-place (ADVICE r14 staged-topic
    # race — same fix everywhere the write-once cache is built)
    return layout_cache.build_once(idx, _build)


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus fingerprint — sources/layout_cache.py)
    the partitionBy(bucket) parquet index for a corpus's candidate
    vectors; return its path. Subsequent calls on an unchanged corpus
    reuse it — the write-once/probe-many economics the index exists
    for (sources/ivf_index.py)."""
    return _build_ivf_layout(spark, sf_dir, _index_dir(sf_dir))


# The shared ANN_IVF_REPLAY_SQL oracle is valid ONLY while the index
# was built with k == N_CENTROIDS and no training sample (i.e. the
# corpus fits n <= TARGET_BUCKET_ROWS * N_CENTROIDS and
# n <= TRAIN_SAMPLE_MAX) — past that the entry would silently diverge
# from its registered oracle and report a false red. The guard below
# fails LOUDLY instead; scale runs (the ladder, where no oracle
# compare happens) opt out via this env var.
IVF_SCALE_OK_ENV = "SPARK_GRAFT_IVF_SCALE_OK"
_IVF_PARAMS = "_IVF_PARAMS.json"


def _check_probe_oracle_regime(idx: str,
                               entry: str = "ann_ivf_probe_indexed",
                               oracle: str = "ANN_IVF_REPLAY_SQL") -> None:
    params_path = os.path.join(idx, _IVF_PARAMS)
    if os.environ.get(IVF_SCALE_OK_ENV) or not os.path.exists(params_path):
        return
    with open(params_path) as fh:
        p = json.load(fh)
    if p["k"] != N_CENTROIDS or p["sample_mod"] is not None:
        raise RuntimeError(
            f"{entry}: oracle not applicable at this scale "
            f"(corpus n={p['n']} built k={p['k']} != {N_CENTROIDS} or "
            f"sampled training mod={p['sample_mod']}) — the registered "
            f"{oracle} would silently diverge and report a "
            f"false red; set {IVF_SCALE_OK_ENV}=1 for non-oracle scale "
            f"runs")


def ann_ivf_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against the WRITTEN index: reads only the n_probe
    bucket partitions per query (planning-time PartitionFilters —
    plan-asserted in tests/test_plans.py). Identical semantics and
    tiebreaks to ann_ivf_topk_replay at sf0.01, where it shares that
    entry's full value oracle; at scale the index is built once per
    corpus and cached, so the measured cell converges on probe-only
    cost (flat across the ladder — scale_local.json)."""
    from last_minute_legends_spark.sources.ivf_index import probe_topk

    idx = ensure_ivf_index(spark, sf_dir)
    _check_probe_oracle_regime(idx)
    queries = _vectors(spark, sf_dir).filter(F.col("id") < N_QUERIES)
    return probe_topk(spark, idx, queries, k=TOP_K,
                      n_probe=IVF_N_PROBE).orderBy("q_id", "rn")


ANN_IVF_APPEND_SQL = _ivf_replay_sql(with_append_delta=True)

IVF_APPEND_VERSION = "v1"


def _append_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ingest batch: every APPEND_MOD-th embedding,
    first dimension + APPEND_EPS, id re-keyed past max(vec_id) (the
    _plant_offset pattern — scale-safe disjoint ids). Near-dups of
    existing vectors, so appended rows actually displace top-k
    results and a probe that missed the appended files would
    value-mismatch."""
    emb = Catalog(spark, sf_dir).embeddings
    off = F.broadcast(
        emb.agg((F.max("vec_id") + F.lit(1)).alias("_off")))
    delta_raw = (
        emb.filter(F.col("vec_id") % APPEND_MOD == 0)
        .crossJoin(off)
        .select(
            (F.col("vec_id") + F.col("_off")).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1) + F.lit(APPEND_EPS)),
                F.expr("slice(embedding, 2, size(embedding) - 1)"),
            ).alias("embedding"),
        )
    )
    return with_unit_vectors(delta_raw)


def ensure_appended_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Private layout (never shared with ensure_ivf_index's cache —
    the appended rows must not leak into ann_ivf_probe_indexed):
    the SAME build body (_build_ivf_layout — one home for the k /
    sampling policy), plus the frozen-centroid delta ingest between
    write and params dump. Cached per corpus fingerprint like every
    derived layout."""
    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.ivf_index import append_ivf_index

    idx = layout_cache.layout_dir(
        "llm_spark_ivf_append", os.path.join(sf_dir, "embeddings.parquet"),
        IVF_APPEND_VERSION)
    return _build_ivf_layout(
        spark, sf_dir, idx,
        post_write=lambda p: append_ivf_index(
            spark, _append_delta(spark, sf_dir), p))


def ann_ivf_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe the APPENDED index: the written IVF layout after
    absorbing an ingest batch through the frozen-centroid append path
    (sources/ivf_index.py::append_ivf_index — no retrain, only the
    touched bucket directories gain files, tested byte-level in
    tests/test_ivf_append.py). The registered oracle extends the
    unrolled-Lloyd replay with the same frozen-centroid delta
    assignment, so the driver gate value-checks that appended vectors
    are assigned, stored, probed and ranked EXACTLY like a fresh
    same-centroid build over base ∪ delta — the index-ingest
    lifecycle's first driver-side value check. The oracle-regime
    guard is shared with ann_ivf_probe_indexed (valid while k ==
    N_CENTROIDS and training is unsampled; loud failure past that)."""
    from last_minute_legends_spark.sources.ivf_index import probe_topk

    idx = ensure_appended_ivf_index(spark, sf_dir)
    _check_probe_oracle_regime(idx, entry="ann_ivf_append_probe",
                               oracle="ANN_IVF_APPEND_SQL")
    queries = _vectors(spark, sf_dir).filter(F.col("id") < N_QUERIES)
    return probe_topk(spark, idx, queries, k=TOP_K,
                      n_probe=IVF_N_PROBE).orderBy("q_id", "rn")


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZED top-k (r17, VERDICT r16 #4) — the 16-64x
    memory tier for a 100 TB vector corpus, beside int8's 4x: each
    candidate vector is PQ_M per-subspace codewords (64 resident BITS
    per 64-dim vector at the shipped 16x4x16 geometry), codebooks
    Lloyd-trained per subspace with the SAME deterministic
    train_centroids machinery the IVF tier proved cross-engine, and
    search is the standard two-stage ADC: shortlist by exact cosine
    against the codebook reconstruction (the value the per-subspace
    lookup-table sum computes), exact re-rank of the shortlist's TRUE
    vectors. Measured recall@10 = 1.0 vs brute force at sf0.01
    (config sweep in operators/similarity.py; >= 0.9 asserted in
    tests/test_operators.py).

    md5-injected like ann_ivf_topk_replay, so the DuckDB oracle
    replays the ENTIRE derivation — 16 per-subspace unrolled Lloyd
    trainings, encoding, reconstruction, shortlist, re-rank — and the
    driver gate value-checks every arithmetic step.

    Codebooks are the PERSISTED model state of a PQ deployment (the
    write-once IVF-index economics): trained once per corpus
    fingerprint, cached as a (sub, id, v, nrm) parquet, and read back
    for every search — repeat invocations pay encode+search only."""
    from last_minute_legends_spark.operators.similarity import (
        PQ_M, pq_topk,
    )

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES).persist()
    cbs, d_sub = _ensure_pq_codebooks(spark, sf_dir, candidates)
    out = (pq_topk(queries, candidates, cbs, d_sub, k=TOP_K)
           .localCheckpoint(eager=True))
    candidates.unpersist()
    return out


def _ensure_pq_codebooks(spark: SparkSession, sf_dir: str,
                         candidates: DataFrame) -> tuple[list, int]:
    """Train-once/search-many codebook cache: PQ_M per-subspace
    centroid sets stacked into one parquet with a ``sub`` column plus
    a d_sub params file, keyed by corpus fingerprint."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M, pq_codebooks,
    )
    from last_minute_legends_spark.sources import layout_cache

    idx = layout_cache.layout_dir(
        "llm_spark_pq_codebooks", os.path.join(sf_dir, "embeddings.parquet"),
        f"v1-md5-m{PQ_M}k{PQ_K}i{PQ_ITERS}")

    def _build(tmp: str) -> None:
        cbs, d_sub = pq_codebooks(candidates, id_hash=md5_id_hash)
        stacked = cbs[0].select(F.lit(0).alias("sub"), "id", "v", "nrm")
        for i, cb in enumerate(cbs[1:], start=1):
            stacked = stacked.unionByName(
                cb.select(F.lit(i).alias("sub"), "id", "v", "nrm"))
        stacked.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "codebooks"))
        with open(os.path.join(tmp, "_PQ_PARAMS.json"), "w") as fh:
            json.dump({"d_sub": d_sub, "m": PQ_M}, fh)

    layout_cache.build_once(idx, _build)
    with open(os.path.join(idx, "_PQ_PARAMS.json")) as fh:
        p = json.load(fh)
    return _collect_stacked_codebooks(spark, os.path.join(idx, "codebooks"),
                                      p["m"]), p["d_sub"]


def _collect_stacked_codebooks(spark: SparkSession, path: str,
                               m: int) -> list:
    """The cached stacked-codebook parquet as m pre-collected sorted
    row lists — ONE collect job (r17-opt; the former m filtered
    frames cost one collect job EACH inside every encode, ~0.2 s of
    job scheduling apiece at m=16). The model is k·m·d_sub cells —
    model-parameter-sized, the train_centroids collect economics."""
    by_sub: dict[int, list] = {}
    for r in spark.read.parquet(path).collect():
        by_sub.setdefault(int(r.sub), []).append(
            (int(r.id), [float(x) for x in r.v], float(r.nrm)))
    return [sorted(by_sub[i]) for i in range(m)]


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (r17b) — the composed FAISS-standard tier for a 100 TB
    vector corpus: coarse IVF pruning bounds what a probe READS
    (n_probe/k_coarse of the data), PQ codes bound what the index
    STORES (m small ints per vector), exact re-rank on the
    shortlist's true vectors holds recall. Both component
    derivations are the oracle-proven ones (train_centroids coarse
    model == ann_ivf_topk_replay's; codebooks == ann_pq_topk's,
    shared cache), and the composed DuckDB oracle (ANN_IVFPQ_SQL)
    replays coarse Lloyd + 16 per-subspace Lloyds + encode +
    probe-restricted ADC shortlist + re-rank end-to-end — the
    driver value-checks the COMPOSITION, not just the parts.

    Measured recall@10 vs the same-probe exact IVF search = 1.0 at
    sf0.01 (the ADC shortlist of 100 within ~125-row probed buckets
    is near-exhaustive; asserted >= 0.9 in tests/test_operators.py
    against ann_ivf_topk, isolating PQ loss from probe loss)."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import ivfpq_topk

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES).persist()
    centroids = train_centroids(candidates, k=N_CENTROIDS,
                                iters=IVF_ITERS, id_hash=md5_id_hash)
    cbs, d_sub = _ensure_pq_codebooks(spark, sf_dir, candidates)
    out = (ivfpq_topk(queries, candidates, centroids, cbs, d_sub,
                      k=TOP_K, n_probe=IVF_N_PROBE)
           .localCheckpoint(eager=True))
    candidates.unpersist()
    return out


def _ivfpq_replay_sql(with_append_delta: bool = False) -> str:
    """The composed IVF-PQ oracle: the coarse-Lloyd chain and probe
    selection from _ivf_replay_sql, the per-subspace codebook chains
    and reconstruction from _pq_replay_sql, and an ADC shortlist
    RESTRICTED to each query's probed buckets — then the exact
    re-rank tail. All chains come from the shared _lloyd_ctes.
    ``with_append_delta`` extends it with the frozen-MODEL ingest:
    the re-keyed perturbed batch assigned against the FINAL coarse
    centroids AND encoded against the FINAL codebooks (neither model
    re-enters training — the append_ivf_index semantics on both
    axes), unioned into the searched set."""
    from last_minute_legends_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M, PQ_RERANK,
    )

    parts = [f"""n AS MATERIALIZED (
    SELECT vec_id AS id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), qry AS MATERIALIZED (SELECT * FROM n WHERE id < {N_QUERIES}),
cand AS MATERIALIZED (SELECT * FROM n WHERE id >= {N_QUERIES}),
dim AS MATERIALIZED (SELECT len(v) // {PQ_M} AS d FROM cand LIMIT 1)"""]
    parts.extend(_lloyd_ctes("cand", N_CENTROIDS, IVF_ITERS))
    parts.append(_ivf_assign_cte("bucketed", f"cent{IVF_ITERS}"))
    searched = "bucketed"
    if with_append_delta:
        parts.append(f"""dn AS MATERIALIZED (
    SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS id,
           list_concat([v0[1] + {APPEND_EPS}], v0[2:]) AS v
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings
          WHERE vec_id % {APPEND_MOD} = 0)
), delta AS MATERIALIZED (
    SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM dn
)""")
        parts.append(_ivf_assign_cte("delta_assigned", f"cent{IVF_ITERS}",
                                     src="delta"))
        parts.append("""all_bucketed AS MATERIALIZED (
    SELECT * FROM bucketed UNION ALL SELECT * FROM delta_assigned
)""")
        searched = "all_bucketed"
    qcos = _IVF_COS.format(a="q", b="ct")
    parts.append(f"""probes AS MATERIALIZED (
    SELECT q_id, bucket FROM (
        SELECT q.id AS q_id, ct.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY q.id
                   ORDER BY {qcos} DESC, ct.cent_id) AS rn
        FROM qry q CROSS JOIN cent{IVF_ITERS} ct
    ) WHERE rn <= {IVF_N_PROBE}
)""")
    for m in range(PQ_M):
        lo = f"(SELECT d FROM dim) * {m} + 1"
        hi = f"(SELECT d FROM dim) * {m + 1}"
        parts.append(f"""sub{m} AS MATERIALIZED (
    SELECT id, v[{lo}:{hi}] AS v,
           sqrt(list_dot_product(v[{lo}:{hi}], v[{lo}:{hi}])) AS nrm
    FROM cand
)""")
        parts.extend(_lloyd_ctes(f"sub{m}", PQ_K, PQ_ITERS, prefix=f"s{m}"))
        code_src = f"sub{m}"
        if with_append_delta:
            # encode the WHOLE searched set (base ∪ delta) against the
            # codebooks trained on base only
            parts.append(f"""asub{m} AS MATERIALIZED (
    SELECT id, v[{lo}:{hi}] AS v,
           sqrt(list_dot_product(v[{lo}:{hi}], v[{lo}:{hi}])) AS nrm
    FROM {searched}
)""")
            code_src = f"asub{m}"
        parts.append(_ivf_assign_cte(f"s{m}coded", f"s{m}cent{PQ_ITERS}",
                                     src=code_src))
    joins = "\n    ".join(
        f"JOIN s{m}coded a{m} ON a{m}.id = c.id "
        f"JOIN s{m}cent{PQ_ITERS} w{m} ON w{m}.cent_id = a{m}.bucket"
        for m in range(PQ_M))
    concat = " || ".join(f"w{m}.cv" for m in range(PQ_M))
    parts.append(f"""recon AS MATERIALIZED (
    SELECT c.id, c.bucket, {concat} AS rv
    FROM {searched} c
    {joins}
)""")
    parts.append(f"""shortlist AS MATERIALIZED (
    SELECT q_id, c_id FROM (
        SELECT p.q_id, r.id AS c_id,
               row_number() OVER (
                   PARTITION BY p.q_id
                   ORDER BY list_dot_product(q.v, r.rv)
                            / (q.nrm * sqrt(list_dot_product(r.rv, r.rv)))
                            DESC, r.id) AS rn
        FROM probes p
        JOIN recon r ON r.bucket = p.bucket
        JOIN qry q ON q.id = p.q_id
    ) WHERE rn <= {PQ_RERANK}
)""")
    return "WITH " + ",\n".join(parts) + f""",
scored AS (
    SELECT s.q_id, s.c_id,
           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
    FROM shortlist s
    JOIN qry q ON q.id = s.q_id
    JOIN {searched} c ON c.id = s.c_id
), ranked AS (
    SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, c_id) AS rn
    FROM scored
)
SELECT q_id, rn, c_id, round(cos, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


ANN_IVFPQ_SQL = _ivfpq_replay_sql()
ANN_IVFPQ_APPEND_SQL = _ivfpq_replay_sql(with_append_delta=True)


def ann_ivfpq_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ INGEST (r17b): the composed tier's frozen-model append
    — a deterministic batch of re-keyed near-dup vectors joins the
    searched set by assignment against the FROZEN coarse centroids
    and encoding against the FROZEN codebooks (neither model
    retrains: the append_ivf_index discipline applied to both model
    axes at once; at 100 TB this is new parquet files in touched
    bucket dirs carrying only (id, codes)). The appended vectors are
    near-dups of existing ones, so they displace top-k rows — a probe
    that missed them value-mismatches. Oracle = the composed replay
    EXTENDED with the same frozen-model delta (ANN_IVFPQ_APPEND_SQL),
    value-checking that ingested vectors are assigned, encoded,
    probed and re-ranked EXACTLY like a same-model build over
    base ∪ delta."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import ivfpq_topk

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    base = vecs.filter(F.col("id") >= N_QUERIES).persist()
    centroids = train_centroids(base, k=N_CENTROIDS,
                                iters=IVF_ITERS, id_hash=md5_id_hash)
    cbs, d_sub = _ensure_pq_codebooks(spark, sf_dir, base)
    searched = base.unionByName(_append_delta(spark, sf_dir))
    out = (ivfpq_topk(queries, searched, centroids, cbs, d_sub,
                      k=TOP_K, n_probe=IVF_N_PROBE)
           .localCheckpoint(eager=True))
    base.unpersist()
    return out


def ann_ivfpq_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed tier's WRITTEN layout (r17b,
    sources/ivfpq_index.py): coarse-bucketed, PQ-encoded (id, codes)
    rows partitioned by bucket — the index resident state is m small
    ints per vector (64 bits at the shipped geometry; the codes
    scan's ReadSchema carries no float vector, plan-asserted) and a
    probe reads only its n_probe bucket dirs via a planning-literal
    bucket IN (...) (the ann_ivf_probe_indexed discipline). ADC
    reconstructs from the codeword literal at probe time; the exact
    re-rank fetches true vectors candidate-only from the base table.
    Value-identical to ann_ivfpq_topk over the same cached models,
    so it shares the composed replay oracle ANN_IVFPQ_SQL — the
    driver value-checks write → prune → decode → re-rank
    end-to-end."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import PQ_RERANK
    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.ivfpq_index import (
        ivfpq_probe_topk, write_ivfpq_index,
    )

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES).persist()
    idx = layout_cache.layout_dir(
        "llm_spark_ivfpq_index",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"v1-md5-k{N_CENTROIDS}")

    def _build(tmp: str) -> None:
        cent = train_centroids(candidates, k=N_CENTROIDS,
                               iters=IVF_ITERS, id_hash=md5_id_hash)
        cbs, d_sub = _ensure_pq_codebooks(spark, sf_dir, candidates)
        write_ivfpq_index(candidates, cent, cbs, d_sub, tmp)

    layout_cache.build_once(idx, _build)
    out = (ivfpq_probe_topk(spark, idx, queries, candidates, k=TOP_K,
                            n_probe=IVF_N_PROBE, rerank=PQ_RERANK)
           .orderBy("q_id", "rn").localCheckpoint(eager=True))
    candidates.unpersist()
    return out


def ann_ivfpq_append_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITTEN composed index after frozen-model INGEST (r17b):
    the deterministic re-keyed batch absorbed via
    sources/ivfpq_index.py::append_ivfpq_index — assignment against
    the stored coarse centroids, encoding against the stored
    codebooks, mode("append") files landing only in touched bucket
    dirs (pre-append files byte-identical, test-locked) — then probed
    with the same planning-pruned codes scan. Value-identical to the
    in-memory frozen-model composition over base ∪ delta, so it
    shares ANN_IVFPQ_APPEND_SQL: the driver value-checks the whole
    write → ingest → prune → decode → re-rank lifecycle. Private
    layout cache (appended rows must never leak into
    ann_ivfpq_probe_indexed's layout)."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import PQ_RERANK
    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.ivfpq_index import (
        append_ivfpq_index, ivfpq_probe_topk, write_ivfpq_index,
    )

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    base = vecs.filter(F.col("id") >= N_QUERIES).persist()
    idx = layout_cache.layout_dir(
        "llm_spark_ivfpq_append",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"v1-md5-k{N_CENTROIDS}")

    def _build(tmp: str) -> None:
        cent = train_centroids(base, k=N_CENTROIDS,
                               iters=IVF_ITERS, id_hash=md5_id_hash)
        cbs, d_sub = _ensure_pq_codebooks(spark, sf_dir, base)
        write_ivfpq_index(base, cent, cbs, d_sub, tmp)
        append_ivfpq_index(spark, _append_delta(spark, sf_dir), tmp)

    layout_cache.build_once(idx, _build)
    corpus = base.unionByName(_append_delta(spark, sf_dir))
    out = (ivfpq_probe_topk(spark, idx, queries, corpus, k=TOP_K,
                            n_probe=IVF_N_PROBE, rerank=PQ_RERANK)
           .orderBy("q_id", "rn").localCheckpoint(eager=True))
    base.unpersist()
    return out


def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with RESIDUAL encoding (r17b — FAISS IVFADC proper,
    closing SURVEY §8's 'residual PQ' candidate): codebooks quantize
    v − coarse_centroid instead of raw vectors, spending the same
    64 resident bits where the in-bucket variance actually is;
    reconstruction = centroid + decoded residual, search = the
    probe-restricted ADC shortlist + exact re-rank. Residual
    codebooks cached per corpus fingerprint (they derive from the
    deterministic coarse model, so the cache key needs only the
    corpus + geometry). md5-injected; the oracle replays coarse
    Lloyd → per-bucket residuals (elementwise list arithmetic,
    exact on both engines) → 16 residual-subspace Lloyds → encode →
    centroid+codeword reconstruction → probe-restricted shortlist →
    exact re-rank."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash
    from last_minute_legends_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M, PQ_RERANK, ivfpq_residual_topk,
        pq_codebooks, residual_frame,
    )
    from last_minute_legends_spark.sources import layout_cache

    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES).persist()
    centroids = train_centroids(candidates, k=N_CENTROIDS,
                                iters=IVF_ITERS, id_hash=md5_id_hash)

    idx = layout_cache.layout_dir(
        "llm_spark_pqr_codebooks",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"v1-md5-k{N_CENTROIDS}m{PQ_M}k{PQ_K}i{PQ_ITERS}")

    def _build(tmp: str) -> None:
        resid = residual_frame(candidates, centroids)
        cbs, d_sub = pq_codebooks(resid.select("id", "v", "nrm"),
                                  id_hash=md5_id_hash)
        stacked = cbs[0].select(F.lit(0).alias("sub"), "id", "v", "nrm")
        for i, cb in enumerate(cbs[1:], start=1):
            stacked = stacked.unionByName(
                cb.select(F.lit(i).alias("sub"), "id", "v", "nrm"))
        stacked.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "codebooks"))
        with open(os.path.join(tmp, "_PQ_PARAMS.json"), "w") as fh:
            json.dump({"d_sub": d_sub, "m": PQ_M}, fh)

    layout_cache.build_once(idx, _build)
    with open(os.path.join(idx, "_PQ_PARAMS.json")) as fh:
        p = json.load(fh)
    cbs = _collect_stacked_codebooks(spark, os.path.join(idx, "codebooks"),
                                     p["m"])
    out = (ivfpq_residual_topk(queries, candidates, centroids, cbs,
                               p["d_sub"], k=TOP_K,
                               n_probe=IVF_N_PROBE, rerank=PQ_RERANK)
           .localCheckpoint(eager=True))
    candidates.unpersist()
    return out


def _ivfpq_residual_replay_sql() -> str:
    """The residual-IVFADC oracle: the composed replay's coarse chain
    and probes, per-bucket residuals via exact elementwise list
    arithmetic, subspace Lloyd chains over the RESIDUALS, and a
    centroid+codeword reconstruction feeding the probe-restricted
    shortlist + re-rank tail."""
    from last_minute_legends_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M, PQ_RERANK,
    )

    parts = [f"""n AS MATERIALIZED (
    SELECT vec_id AS id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), qry AS MATERIALIZED (SELECT * FROM n WHERE id < {N_QUERIES}),
cand AS MATERIALIZED (SELECT * FROM n WHERE id >= {N_QUERIES}),
dim AS MATERIALIZED (SELECT len(v) // {PQ_M} AS d FROM cand LIMIT 1)"""]
    parts.extend(_lloyd_ctes("cand", N_CENTROIDS, IVF_ITERS))
    parts.append(_ivf_assign_cte("bucketed", f"cent{IVF_ITERS}"))
    qcos = _IVF_COS.format(a="q", b="ct")
    parts.append(f"""probes AS MATERIALIZED (
    SELECT q_id, bucket FROM (
        SELECT q.id AS q_id, ct.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY q.id
                   ORDER BY {qcos} DESC, ct.cent_id) AS rn
        FROM qry q CROSS JOIN cent{IVF_ITERS} ct
    ) WHERE rn <= {IVF_N_PROBE}
)""")
    parts.append(f"""residn AS MATERIALIZED (
    SELECT b.id,
           list_transform(list_zip(b.v, ct.cv), x -> x[1] - x[2]) AS v,
           sqrt(list_dot_product(
               list_transform(list_zip(b.v, ct.cv), x -> x[1] - x[2]),
               list_transform(list_zip(b.v, ct.cv), x -> x[1] - x[2])
           )) AS nrm,
           b.bucket
    FROM bucketed b JOIN cent{IVF_ITERS} ct ON ct.cent_id = b.bucket
)""")
    for m in range(PQ_M):
        lo = f"(SELECT d FROM dim) * {m} + 1"
        hi = f"(SELECT d FROM dim) * {m + 1}"
        parts.append(f"""rsub{m} AS MATERIALIZED (
    SELECT id, v[{lo}:{hi}] AS v,
           sqrt(list_dot_product(v[{lo}:{hi}], v[{lo}:{hi}])) AS nrm
    FROM residn
)""")
        parts.extend(_lloyd_ctes(f"rsub{m}", PQ_K, PQ_ITERS,
                                 prefix=f"r{m}"))
        parts.append(_ivf_assign_cte(f"r{m}coded", f"r{m}cent{PQ_ITERS}",
                                     src=f"rsub{m}"))
    joins = "\n    ".join(
        f"JOIN r{m}coded a{m} ON a{m}.id = c.id "
        f"JOIN r{m}cent{PQ_ITERS} w{m} ON w{m}.cent_id = a{m}.bucket"
        for m in range(PQ_M))
    concat = " || ".join(f"w{m}.cv" for m in range(PQ_M))
    parts.append(f"""recon AS MATERIALIZED (
    SELECT c.id, c.bucket,
           list_transform(list_zip({concat}, ct.cv),
                          x -> x[1] + x[2]) AS rv
    FROM residn c
    JOIN cent{IVF_ITERS} ct ON ct.cent_id = c.bucket
    {joins}
)""")
    parts.append(f"""shortlist AS MATERIALIZED (
    SELECT q_id, c_id FROM (
        SELECT p.q_id, r.id AS c_id,
               row_number() OVER (
                   PARTITION BY p.q_id
                   ORDER BY list_dot_product(q.v, r.rv)
                            / (q.nrm * sqrt(list_dot_product(r.rv, r.rv)))
                            DESC, r.id) AS rn
        FROM probes p
        JOIN recon r ON r.bucket = p.bucket
        JOIN qry q ON q.id = p.q_id
    ) WHERE rn <= {PQ_RERANK}
)""")
    return "WITH " + ",\n".join(parts) + f""",
scored AS (
    SELECT s.q_id, s.c_id,
           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
    FROM shortlist s
    JOIN qry q ON q.id = s.q_id
    JOIN cand c ON c.id = s.c_id
), ranked AS (
    SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, c_id) AS rn
    FROM scored
)
SELECT q_id, rn, c_id, round(cos, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


ANN_IVFPQ_RESIDUAL_SQL = _ivfpq_residual_replay_sql()


def _pq_replay_sql() -> str:
    """From-scratch DuckDB unroll of the full PQ derivation (the
    _ivf_replay_sql pattern applied per subspace): for each of PQ_M
    subspaces — id-stripe seed selection → PQ_ITERS Lloyd iterations
    → final argmax-cosine code assignment — then codeword
    reconstruction (concatenation in subspace order), ADC shortlist
    of PQ_RERANK by reconstructed cosine, and exact re-rank of the
    shortlist against the true vectors. Tiebreaks everywhere on
    lowest centroid/candidate id, matching the Spark folds."""
    from last_minute_legends_spark.operators.similarity import (
        PQ_ITERS, PQ_K, PQ_M, PQ_RERANK,
    )

    parts = [f"""n AS MATERIALIZED (
    SELECT vec_id AS id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), qry AS MATERIALIZED (SELECT * FROM n WHERE id < {N_QUERIES}),
cand AS MATERIALIZED (SELECT * FROM n WHERE id >= {N_QUERIES}),
dim AS MATERIALIZED (SELECT len(v) // {PQ_M} AS d FROM cand LIMIT 1)"""]
    for m in range(PQ_M):
        lo = f"(SELECT d FROM dim) * {m} + 1"
        hi = f"(SELECT d FROM dim) * {m + 1}"
        parts.append(f"""sub{m} AS MATERIALIZED (
    SELECT id, v[{lo}:{hi}] AS v,
           sqrt(list_dot_product(v[{lo}:{hi}], v[{lo}:{hi}])) AS nrm
    FROM cand
)""")
        parts.extend(_lloyd_ctes(f"sub{m}", PQ_K, PQ_ITERS, prefix=f"s{m}"))
        parts.append(_ivf_assign_cte(f"s{m}coded", f"s{m}cent{PQ_ITERS}",
                                     src=f"sub{m}"))
    # reconstruction: per-subspace codeword vectors concatenated in
    # subspace order
    joins = "\n    ".join(
        f"JOIN s{m}coded a{m} ON a{m}.id = c.id "
        f"JOIN s{m}cent{PQ_ITERS} w{m} ON w{m}.cent_id = a{m}.bucket"
        for m in range(PQ_M))
    concat = " || ".join(f"w{m}.cv" for m in range(PQ_M))
    parts.append(f"""recon AS MATERIALIZED (
    SELECT c.id, {concat} AS rv
    FROM cand c
    {joins}
)""")
    parts.append(f"""shortlist AS MATERIALIZED (
    SELECT q_id, c_id FROM (
        SELECT q.id AS q_id, r.id AS c_id,
               row_number() OVER (
                   PARTITION BY q.id
                   ORDER BY list_dot_product(q.v, r.rv)
                            / (q.nrm * sqrt(list_dot_product(r.rv, r.rv)))
                            DESC, r.id) AS rn
        FROM qry q CROSS JOIN recon r
    ) WHERE rn <= {PQ_RERANK}
)""")
    return "WITH " + ",\n".join(parts) + f""",
scored AS (
    SELECT s.q_id, s.c_id,
           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
    FROM shortlist s
    JOIN qry q ON q.id = s.q_id
    JOIN cand c ON c.id = s.c_id
), ranked AS (
    SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, c_id) AS rn
    FROM scored
)
SELECT q_id, rn, c_id, round(cos, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


ANN_PQ_SQL = _pq_replay_sql()


def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k over int8-quantized candidates: queries stay
    full-precision (they're tiny); the 100 TB candidate side is the
    4x-smaller quantized table, dequantized on the fly in the scan
    (narrow). Demonstrates the storage/bandwidth path; recall vs the
    float baseline is asserted in tests."""
    vecs = _vectors(spark, sf_dir, spread=True)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = dequantize(quantize_int8(vecs.filter(F.col("id") >= N_QUERIES)))
    return brute_topk(queries, candidates, k=TOP_K).orderBy("q_id", "rn")


ANN_QUANTIZED_SQL = f"""
WITH n AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM n WHERE vec_id >= {N_QUERIES}
), dq AS (
    SELECT vec_id,
           CASE WHEN scale = 0
                THEN list_transform(v, x -> 0.0)
                ELSE list_transform(v, x -> CAST(round(x / scale) AS INT) * scale)
           END AS v
    FROM s
), c AS (
    SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM dq
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
    FROM (SELECT * FROM n WHERE vec_id < {N_QUERIES}) q JOIN c ON true
), ranked AS (
    SELECT q_id, c_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
    FROM scored
)
SELECT q_id, rn, c_id, round(cos, 4) AS cosine
FROM ranked WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


SPARK = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_topk_replay": ann_ivf_topk_replay,
    "ann_ivf_probe_indexed": ann_ivf_probe_indexed,
    "ann_ivf_append_probe": ann_ivf_append_probe,
    "ann_quantized_topk": ann_quantized_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivfpq_append_probe": ann_ivfpq_append_probe,
    "ann_ivfpq_probe_indexed": ann_ivfpq_probe_indexed,
    "ann_ivfpq_append_indexed": ann_ivfpq_append_indexed,
    "ann_ivfpq_residual_topk": ann_ivfpq_residual_topk,
}

SQL = {
    "ann_bruteforce_topk": ANN_BRUTEFORCE_SQL,
    "ann_ivf_topk": None,  # xxhash64 seeds: rows-only + recall unit test
    # r12: the portable-hash twin gives the IVF family its first
    # DRIVER-side value check — the full unrolled-Lloyd replay
    # tests/test_ivf_replay.py ran locally since r7, now registered
    # with full ORACLE_SQL
    "ann_ivf_topk_replay": ANN_IVF_REPLAY_SQL,
    # r12: the written-index probe reduces to the replay derivation at
    # sf0.01 (k = 8, no training sample — see TARGET_BUCKET_ROWS), so
    # the same unrolled-Lloyd oracle value-checks the index write +
    # partition-pruned probe path end-to-end
    "ann_ivf_probe_indexed": ANN_IVF_REPLAY_SQL,
    # r13: the replay extended with the frozen-centroid delta — the
    # index-ingest (append) lifecycle's driver-side value check
    "ann_ivf_append_probe": ANN_IVF_APPEND_SQL,
    # r17: the PQ tier — 16 per-subspace unrolled-Lloyd trainings +
    # encode + reconstruct + ADC shortlist + exact re-rank, replayed
    "ann_pq_topk": ANN_PQ_SQL,
    # r17b: the IVF-PQ composition — coarse Lloyd + probes + subspace
    # Lloyds + probe-restricted ADC shortlist + re-rank, replayed
    "ann_ivfpq_topk": ANN_IVFPQ_SQL,
    # r17b: the composition's frozen-model ingest — the same replay
    # extended with the delta assigned+encoded against frozen models
    "ann_ivfpq_append_probe": ANN_IVFPQ_APPEND_SQL,
    # r17b: the written codes-only layout probes value-identically to
    # the in-memory composition — same composed replay oracle
    "ann_ivfpq_probe_indexed": ANN_IVFPQ_SQL,
    # r17b: the written layout after frozen-model ingest — the
    # append-extended composed replay
    "ann_ivfpq_append_indexed": ANN_IVFPQ_APPEND_SQL,
    # r17b: residual IVFADC — coarse Lloyd + per-bucket residuals +
    # 16 residual-subspace Lloyds + centroid+codeword reconstruction
    "ann_ivfpq_residual_topk": ANN_IVFPQ_RESIDUAL_SQL,
}

LOCAL_SQL = {
    # r12: lends its window slot to ann_ivf_probe_indexed (the 50-slot
    # gate is full) after green driver observations in r9 and r11; the
    # identical value compare keeps running locally via
    # tests/test_oracle.py
    "ann_quantized_topk": ANN_QUANTIZED_SQL,
}
