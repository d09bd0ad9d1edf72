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

from last_minute_legends_spark.operators.similarity import (
    ivf_topk,
    train_centroids,
    with_unit_vectors,
)
from last_minute_legends_spark.plans.ann_q import (
    N_CENTROIDS,
    N_QUERIES,
    TOP_K,
)
from last_minute_legends_spark.sources.tables import Catalog
from tests.oracle import compare, run_oracle

ITERS = 3
N_PROBE = 2


def _md5h(c):
    """60-bit hash from the md5 of the id's decimal rendering —
    same string, same digest, same integer on both engines."""
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")


_DH = "('0x' || substr(md5(id::VARCHAR), 1, 15))::UBIGINT::BIGINT"
_COS = "list_dot_product({a}.v, {b}.cv) / ({a}.nrm * {b}.cn)"


def _assign_cte(name: str, cent: str) -> str:
    """Argmax-cosine bucket per candidate against centroid set
    ``cent`` — row_number on (cos DESC, cent_id ASC) matches the
    Spark fold's strict-> earliest-wins tiebreak."""
    cos = _COS.format(a="c", b="ct")
    return f"""{name} AS MATERIALIZED (
    SELECT id, v, nrm, bucket FROM (
        SELECT c.id, c.v, c.nrm, ct.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY c.id
                   ORDER BY {cos} DESC, ct.cent_id) AS rn
        FROM cand c CROSS JOIN {cent} ct
    ) WHERE rn = 1
)"""


def _ivf_replay_sql() -> str:
    parts = [f"""n AS MATERIALIZED (
    SELECT vec_id AS id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
    FROM embeddings
), qry AS MATERIALIZED (SELECT * FROM n WHERE id < {N_QUERIES}),
cand AS MATERIALIZED (SELECT * FROM n WHERE id >= {N_QUERIES}),
cent0 AS MATERIALIZED (
    SELECT bucket AS cent_id, arg_min(v, id) AS cv, arg_min(nrm, id) AS cn
    FROM (SELECT id, v, nrm, {_DH} % {N_CENTROIDS} AS bucket FROM cand)
    GROUP BY bucket
)"""]
    for i in range(1, ITERS + 1):
        parts.append(_assign_cte(f"assign{i}", f"cent{i - 1}"))
        # per-(bucket, dimension) means, rounded 8 dp like the Spark
        # loop; empty buckets keep the previous centroid (LEFT JOIN)
        parts.append(f"""means{i} AS MATERIALIZED (
    SELECT bucket, list(m ORDER BY pos) AS mv
    FROM (
        SELECT bucket, pos, round(avg(v[pos]), 8) AS m
        FROM assign{i}, UNNEST(generate_series(1, len(v))) t(pos)
        GROUP BY bucket, pos
    ) GROUP BY bucket
)""")
        parts.append(f"""cent{i} AS MATERIALIZED (
    SELECT ct.cent_id,
           coalesce(m.mv, ct.cv) AS cv,
           CASE WHEN m.mv IS NULL THEN ct.cn
                ELSE sqrt(list_dot_product(m.mv, m.mv)) END AS cn
    FROM cent{i - 1} ct LEFT JOIN means{i} m ON m.bucket = ct.cent_id
)""")
    parts.append(_assign_cte("bucketed", f"cent{ITERS}"))
    qcos = _COS.format(a="q", b="ct")
    parts.append(f"""probes AS MATERIALIZED (
    SELECT q_id, bucket FROM (
        SELECT q.id AS q_id, ct.cent_id AS bucket,
               row_number() OVER (
                   PARTITION BY q.id
                   ORDER BY {qcos} DESC, ct.cent_id) AS rn
        FROM qry q CROSS JOIN cent{ITERS} ct
    ) WHERE rn <= {N_PROBE}
)""")
    return "WITH " + ",\n".join(parts) + f""",
scored AS (
    SELECT p.q_id, b.id AS c_id,
           list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS cos
    FROM probes p
    JOIN bucketed b ON b.bucket = p.bucket
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
