"""Similarity search over an embedding column (array<float>).

- ``brute_topk``: exact cosine top-k — the correctness baseline. The
  query side is tiny and broadcast, so the scan side never shuffles;
  cost is one pass over the candidates per batch of queries.
- ``ivf_topk``: IVF-style approximate search. A fixed, deterministic
  centroid set partitions the candidates into buckets (argmax-cosine
  assignment); each query probes its ``n_probe`` nearest buckets.
  At 100 TB the bucket assignment is a write-time partitioning
  (partitionBy(bucket) parquet), so a probe reads only
  n_probe/n_centroids of the data — here expressed over the same
  table to keep the operator self-contained.

All vector math is native expressions (functions/vectors.py); cosine
sums run sequentially left-to-right, matching DuckDB's
list_dot_product for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.vectors import cosine, norm, to_double_array


def with_unit_vectors(emb: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(id, v: array<double>, nrm: double) — norm precomputed once."""
    v = to_double_array(F.col(vec_col))
    return emb.select(F.col(id_col).alias("id"), v.alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )


def brute_topk(queries: DataFrame, candidates: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k: (q_id, rn, c_id, cosine) — queries/candidates as
    produced by with_unit_vectors. Queries are broadcast."""
    q = queries.select(
        F.col("id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = candidates.select(
        F.col("id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = F.broadcast(q).join(c).withColumn(
        "cos", cosine(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "rn", "c_id", F.round("cos", 4).alias("cosine"))
    )


def train_centroids(vecs: DataFrame, k: int = 8, iters: int = 3,
                    sample_mod: int | None = None) -> DataFrame:
    """Deterministic Lloyd k-means over (id, v, nrm) vectors → a
    k-row (id, v, nrm) centroid set.

    - Seeds: one per id-hash stripe — for each bucket
      ``pmod(xxhash64(id), k)``, the member vector with the smallest
      id. Deterministic, no RNG, and crucially no global sort: seed
      selection is a single map-side-combinable ``min_by`` shuffle of
      k rows (the r3 formulation ranked the whole training frame with
      a global ``Window.orderBy(id)`` plus a separate count — a
      single-partition sort that contradicts the 100 TB story).
    - Iterations: argmax-cosine assignment (broadcast centroids, big
      side never shuffles beyond the id-window) → per-bucket dimension
      means (posexplode + groupBy — a shuffle of k·dim tiny rows) →
      re-formed centroid arrays, components rounded to 8 dp so
      float summation order can't make training run-to-run unstable.
    - ``sample_mod``: train on the deterministic id-hash sample
      ``xxhash64(id) % sample_mod == 0`` — at 100 TB you train on a
      bounded sample and assign the full set afterwards.

    Collecting k centroid rows is model-parameter extraction (k≈8),
    not a data-path collect — same shape as MLlib's KMeansModel.
    """
    train = vecs
    if sample_mod:
        train = train.filter(F.pmod(F.xxhash64(F.col("id")), sample_mod) == 0)
    cent = (
        train.select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(k)).cast("int").alias("bucket"),
            "id", "v", "nrm",
        )
        .groupBy("bucket")
        .agg(F.min_by(F.struct("v", "nrm"), F.col("id")).alias("seed"))
        .select(
            F.col("bucket").alias("id"),
            F.col("seed.v").alias("v"),
            F.col("seed.nrm").alias("nrm"),
        )
    )
    for _ in range(iters):
        assigned = assign_buckets(train, cent)
        means = (
            assigned.select("bucket", F.posexplode("v").alias("pos", "x"))
            .groupBy("bucket", "pos")
            .agg(F.round(F.avg("x"), 8).alias("m"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("v")
            )
            .select(F.col("bucket").alias("id"), "v")
            .withColumn("nrm", norm(F.col("v")))
        )
        # empty buckets keep their previous centroid
        prev = cent.select("id", F.col("v").alias("pv"), F.col("nrm").alias("pn"))
        cent = (
            prev.join(means, "id", "left")
            .select(
                "id",
                F.coalesce("v", "pv").alias("v"),
                F.coalesce("nrm", "pn").alias("nrm"),
            )
        )
    # materialize the k trained rows as literals: every downstream use
    # (bucket assignment, query probing) would otherwise re-evaluate
    # the full iteration lineage — k≈8 rows is model-parameter size
    spark = vecs.sparkSession
    rows = [(int(r.id), list(r.v), float(r.nrm)) for r in cent.collect()]
    return spark.createDataFrame(rows, "id int, v array<double>, nrm double")


def assign_buckets(candidates: DataFrame, centroids: DataFrame) -> DataFrame:
    """argmax-cosine centroid per candidate (deterministic tiebreak on
    centroid id). Centroids are broadcast — no shuffle of the big side;
    the argmax is a max_by aggregation (map-side combinable), not a
    sort-window, so the only full pass is one partial-agg shuffle."""
    c = candidates.select("id", "v", "nrm")
    cent = centroids.select(
        F.col("id").alias("cent_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = c.join(F.broadcast(cent)).withColumn(
        "cos", cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn"))
    )
    # max of (cos, -cent_id) = highest cosine, then LOWEST centroid id
    return scored.groupBy("id").agg(
        F.any_value(F.col("v")).alias("v"),
        F.any_value(F.col("nrm")).alias("nrm"),
        F.max_by(
            F.col("cent_id"), F.struct(F.col("cos"), (-F.col("cent_id")).alias("nid"))
        ).alias("bucket"),
    )


def ivf_topk(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
             k: int = 10, n_probe: int = 2) -> DataFrame:
    """Approximate top-k probing n_probe buckets per query."""
    bucketed = assign_buckets(candidates, centroids)
    cent = centroids.select(
        F.col("id").alias("cent_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    q = queries.select(
        F.col("id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    q_scored = q.join(F.broadcast(cent)).withColumn(
        "cos", cosine(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", "qv", "qn", F.col("cent_id").alias("bucket"))
    )
    scored = F.broadcast(probes).join(bucketed, "bucket").withColumn(
        "cos", cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "rn", F.col("id").alias("c_id"), F.round("cos", 4).alias("cosine"))
    )
