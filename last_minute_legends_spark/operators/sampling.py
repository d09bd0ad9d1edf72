"""Deterministic corpus sampling: domain-mixture rebalancing.

A pretraining pipeline rarely trains on the crawl's natural source
mix — it resamples toward a target mixture (uniform, or weighted
like The Pile / DoReMi). At 100 TB that resampling must be:

- **stateless + deterministic**: membership is a pure function of
  the row key, so the sample survives re-partitioning, incremental
  appends, and re-runs (no RNG seeds to coordinate across 1000
  executors, no sampling state to persist);
- **one extra agg, no extra shuffle of the data**: the only new
  work over the raw scan is a per-source count (map-side
  combinable, k rows out) broadcast back as per-source keep
  thresholds — the corpus itself is filtered in place.

Membership test: the first 8 hex chars of ``md5(id)`` — a uniform
draw from [0, 16^8) — compared lexicographically against the
per-source rate rendered as an 8-hex-char threshold. Fixed-width
lowercase hex compares in numeric order, and every piece (md5,
substring, lpad, hex/to_hex, floor) evaluates identically in Spark
and DuckDB, so the oracle replicates membership EXACTLY, not just
statistically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^8: the md5-prefix bucket space. Rates map to thresholds in
# this space; 8 hex chars keep the threshold render portable.
_BUCKET_SPACE = float(1 << 32)


def md5_prefix_bucket(col: Column) -> Column:
    """Uniform [0, 16^8) draw as a fixed-width hex STRING — the
    portable deterministic-sampling key (see module docstring)."""
    return F.substring(F.md5(col.cast("string")), 1, 8)


def rate_threshold(rate: Column) -> Column:
    """Render a keep-rate in [0, 1] as the 8-hex-char threshold its
    bucket must fall under. Rates >= 1 need the caller's explicit
    guard (the threshold string would overflow 8 chars)."""
    return F.lpad(
        F.lower(F.hex(F.floor(rate * F.lit(_BUCKET_SPACE)).cast("long"))),
        8, "0",
    )


def mixture_sample(docs: DataFrame,
                   weights: dict[str, float] | Column | None = None,
                   source_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Largest deterministic subsample whose source mixture matches
    ``weights`` (default: uniform — every source equally
    represented). ``weights`` may also be a Column expression over
    ``source_col`` for formula-derived mixtures.

    The feasible scale is set by the scarcest source relative to its
    weight: ``t = min_s(n_s / w_s)``; source ``s`` then keeps
    ``w_s * t`` documents via rate ``w_s * t / n_s``. Sources with
    weight 0 (or absent from a provided ``weights``) are dropped.

    Plan: per-source count (k rows) -> 1-row min -> both broadcast
    back onto the scan; the corpus is never shuffled.

    Returns (id_col, source_col, rate) for kept rows, where ``rate``
    is the applied keep-rate rounded to 6 places.
    """
    counts = docs.groupBy(source_col).agg(F.count("*").cast("long").alias("_n"))
    if weights is None:
        wcol = F.lit(1.0)
    elif isinstance(weights, Column):
        wcol = weights
    else:
        wcol = F.lit(0.0)
        for src, wt in sorted(weights.items()):
            wcol = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(wcol)
    counts = counts.withColumn("_w", wcol).filter(F.col("_w") > 0)
    scale = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_t"))
    rates = (
        counts.crossJoin(F.broadcast(scale))
        .select(
            source_col,
            F.least(F.col("_w") * F.col("_t") / F.col("_n"), F.lit(1.0)).alias("_rate"),
        )
    )
    return (
        docs.join(F.broadcast(rates), source_col)
        .filter(
            (F.col("_rate") >= 1.0)
            | (md5_prefix_bucket(F.col(id_col)) < rate_threshold(F.col("_rate")))
        )
        .select(id_col, source_col, F.round(F.col("_rate"), 6).alias("rate"))
    )


def global_shuffle(docs: DataFrame, seed: str = "shuffle-v1",
                   n_shards: int = 16,
                   id_col: str = "doc_id") -> DataFrame:
    """Seeded deterministic GLOBAL shuffle + shard assignment — the
    write shape every epoch of LLM training consumes (docs in a
    pseudo-random order, split into same-sized shards), made
    reproducible without any RNG state: the shuffle key is the
    portable 60-bit md5 hash of (seed, id), so a re-run — or a second
    engine (the DuckDB oracle replays this exactly) — derives the
    identical permutation, and a NEW epoch order is just a new seed
    string.

    Returns (id, shard, pos): shard = key mod ``n_shards``, pos = the
    1-based rank within the shard by (key, id). At 100 TB this is
    precisely Spark's repartition-by-shard + sort-within-partition
    write path (the window's partitionBy(shard) IS that exchange —
    no global sort anywhere); ``n_shards`` is sized so one shard fits
    one writer task, and the hash assignment balances shards to
    within sqrt-law noise regardless of input order or skew."""
    from last_minute_legends_spark.functions.portable_hash import md5_hash60

    keyed = docs.select(
        F.col(id_col),
        md5_hash60(F.lit(seed), F.col(id_col)).alias("_skey"),
    ).withColumn("shard", F.pmod(F.col("_skey"), F.lit(n_shards)))
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return (keyed.withColumn("pos", F.row_number().over(w))
            .select(id_col, "shard", "pos"))
