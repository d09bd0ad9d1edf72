"""Cross-engine value replay of the full IVF pipeline (train + search).

``ann_ivf_topk``'s external check is rows-only (Lloyd training is
iterative, so no single ANSI query expresses the registry entry) and
its local check was recall-vs-brute-force — a behavioral bound, not a
value check. Here the SAME operator code (train_centroids → ivf_topk)
runs with an injected md5-prefix id hash that DuckDB computes
bit-for-bit identically, and a from-scratch DuckDB replay unrolls the
entire derivation as a CTE chain (the BPE-oracle pattern): id-stripe
seed selection → 3 Lloyd iterations of (argmax-cosine assignment →
8-dp per-dimension bucket means → norm re-form, empty buckets keep
their centroid) → per-query 2-probe bucket selection → in-bucket
exact cosine top-k. The final (q_id, rn, c_id, cosine) frames are
compared rows+schema+values, so every arithmetic step of training AND
search must agree across engines — dot products sum left-to-right on
both (functions/vectors.py ≙ list_dot_product), ties break on lowest
centroid/candidate id on both.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from last_minute_legends_spark.functions.portable_hash import (
    md5_id_hash as _md5h,
)
from last_minute_legends_spark.operators.similarity import (
    ivf_topk,
    train_centroids,
    with_unit_vectors,
)
# r12: the replay formulation is now a REGISTRY entry
# (ann_ivf_topk_replay) with driver-side ORACLE_SQL; this test keeps
# running the identical compare locally against the shared SQL.
from last_minute_legends_spark.plans.ann_q import (
    IVF_ITERS as ITERS,
    IVF_N_PROBE as N_PROBE,
    N_CENTROIDS,
    N_QUERIES,
    TOP_K,
    _ivf_replay_sql,
)
from last_minute_legends_spark.sources.tables import Catalog
from tests.oracle import compare, run_oracle


def _spark_ivf(spark, sf_dir, id_hash=None, **train_kw):
    vecs = with_unit_vectors(Catalog(spark, sf_dir).embeddings)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    candidates = vecs.filter(F.col("id") >= N_QUERIES)
    # force the DISTRIBUTED Lloyd loop: this replay exists to
    # cross-check the distributed derivation against DuckDB; the
    # test corpus is below LOCAL_TRAIN_MAX and would otherwise take
    # the driver-side branch (which test_ivf_local_matches_distributed
    # locks against this one).
    train_kw.setdefault("local_train_max", 0)
    cents = train_centroids(candidates, k=N_CENTROIDS, iters=ITERS,
                            id_hash=id_hash, **train_kw)
    return ivf_topk(queries, candidates, cents,
                    k=TOP_K, n_probe=N_PROBE).orderBy("q_id", "rn")


def test_ivf_duckdb_replay(spark, sf_dir):
    sdf = _spark_ivf(spark, sf_dir, id_hash=_md5h)
    odf = run_oracle(_ivf_replay_sql(), sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "ivf replay: " + "\n".join(issues)


def test_injected_hash_changes_nothing_semantic(spark, sf_dir):
    """Default-vs-explicit-default parity: injecting the production
    hash explicitly must reproduce the registry entry's results."""
    from last_minute_legends_spark.operators.similarity import _xx_id_hash

    a = _spark_ivf(spark, sf_dir)
    b = _spark_ivf(spark, sf_dir, id_hash=_xx_id_hash)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
