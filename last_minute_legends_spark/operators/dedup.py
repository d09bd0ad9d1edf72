"""Deduplication operators for LLM training-data pipelines.

Four tiers, all candidate generation by *equi-join* (never an
all-pairs cross join — the cardinal rule at 100 TB):

- exact:      md5(normalized text) hash-groupBy — one shuffle.
- n-gram Jaccard: shared-shingle blocked self-join. Pairs sharing at
  least one shingle meet in a shuffle partition; Jaccard is exact
  integer math (|∩| / (|A|+|B|-|∩|)).
- MinHash+LSH: 32 xxhash64 permutations → 8 bands × 4 rows; banded
  equi-join produces candidates, full-shingle join verifies. Bounded
  false-negative rate, shuffle-partitionable, never O(n²).
- SimHash:    64-bit majority-vote signature over token hashes
  (nested aggregate expressions, all JVM-side); 16-bit band
  equi-join for candidates; bit_count(xor) Hamming verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.text import (
    normalize_text,
    word_shingles,
    words,
)

N_PERM = 32          # minhash permutations
N_BANDS = 8          # → 4 rows per band
ROWS_PER_BAND = N_PERM // N_BANDS


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after normalization) documents:
    (fp, n_docs, keeper_doc_id) for every group with >1 member."""
    return (
        docs.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _shingle_sets(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded rows, distinct per doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )


def jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold.

    Candidate generation is the shared-shingle equi-join: only pairs
    with |∩| >= 1 are ever materialized, and high-threshold pairs by
    definition share many shingles. Jaccard is exact integer division
    so Spark and the SQL oracle agree bit-for-bit.
    """
    sh = _shingle_sets(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, h0..h{N_PERM-1}) minhash signature columns."""
    sh = _shingle_sets(docs, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
        for i in range(N_PERM)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH candidates, verified with
    the true shingle Jaccard (so output = jaccard_pairs minus any
    LSH false negatives — at 8 bands × 4 rows the miss rate at
    j=0.8 is (1-0.8^4)^8 ≈ 0.5%%)."""
    sig = minhash_signatures(docs, id_col, text_col, n)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * ROWS_PER_BAND + r}")
                         for r in range(ROWS_PER_BAND)]).alias("bv"),
        )
        for b in range(N_BANDS)
    ])
    exploded = sig.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.bv").alias("bv")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify candidates with the true Jaccard
    sh = _shingle_sets(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = (
        cand.join(sha, "doc_a").join(shb, "doc_b")
        .filter(F.col("sa") == F.col("sb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


# 64-bit simhash of the distinct-token set: for each bit, majority
# vote of the token hashes' bit values. Nested aggregate() keeps the
# whole computation in one codegen'd expression — no explode blowup.
_SIMHASH_EXPR = """
aggregate(
  sequence(0, 63),
  0L,
  (acc, b) -> acc + if(
      aggregate(hs, 0L, (a, h) -> a + (shiftright(h, b) & 1L) * 2 - 1) > 0,
      shiftleft(1L, b), 0L)
)
"""


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 64-bit signature per document."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            F.array_distinct(words(F.col(text_col))), lambda t: F.xxhash64(t)
        ).alias("hs"),
    )
    return toks.select("doc_id", F.expr(_SIMHASH_EXPR).alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs: equal in at least one 16-bit band
    (guarantees recall for hamming <= 3; good heuristic above),
    verified by bit_count(xor) <= max_hamming."""
    sig = simhash_signatures(docs, id_col, text_col)
    bands = F.array(*[
        F.struct(
            F.lit(k).alias("band"),
            (F.shiftright("simhash", 16 * k).bitwiseAND(F.lit(0xFFFF))).alias("bv"),
        )
        for k in range(4)
    ])
    exploded = sig.select("doc_id", "simhash", F.explode(bands).alias("bs")).select(
        "doc_id", "simhash",
        F.col("bs.band").alias("band"), F.col("bs.bv").alias("bv"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
