"""Text-analysis queries over the ``documents`` table (SURVEY §2.5).

All native column expressions (whole-stage codegen); the regex
patterns are ASCII-only so Java regex (Spark) and RE2 (DuckDB)
agree on every match.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.text import (
    BPE_RE,
    LANG_STOPWORDS,
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    count_matches,
    normalize_text,
)
from last_minute_legends_spark.sources.tables import Catalog, spread_cpu_scan


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan, round-robin spread for the regexp/tokenize-heavy
    pipelines below (train_val_split stays on the plain scan — its
    per-row work is one md5 of the id, and the spread exchange would
    cost more than it unlocks; measured 2.6x in r6)."""
    return spread_cpu_scan(spark, Catalog(spark, sf_dir).documents)


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID via stopword voting.

    Single-pass formulation (r9): one ``split`` tokenization + three
    in-array membership counts, replacing three full-text
    ``regexp_extract_all`` scans (the suite's slowest cell at 2.2 s /
    sf0.1 — the regex engine walked every char of every doc three
    times). Count equivalence with the old ``\\b(w1|w2|…)\\b`` form is
    exact: Java/RE2 ``\\b`` sits between ``[a-z0-9_]`` and anything
    else, so a boundary-delimited stopword occurrence is precisely a
    maximal ``[a-z0-9_]``-run equal to the stopword — which is what
    splitting on ``[^a-z0-9_]+`` and comparing whole tokens counts.
    All codegen (no UDF); the token array lives only inside the
    projection, so nothing wide is shuffled or materialized.
    """
    docs = _docs_spread(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9_]+"),
        lambda t: t != F.lit(""),
    )
    # Column.isin is not usable inside HOF lambdas (NOT_ITERABLE);
    # an 8-way OR of equality comparisons codegens just as well.
    def member(words: tuple[str, ...]):
        return lambda t: reduce(operator.or_, [t == F.lit(w) for w in words])

    counts = {
        name: F.size(F.filter(toks, member(words))).cast("long")
        for name, words in (
            ("n_en", LANG_STOPWORDS["en"]),
            ("n_de", LANG_STOPWORDS["de"]),
            ("n_fr", LANG_STOPWORDS["fr"]),
        )
    }
    d = docs.select("doc_id", *[c.alias(n) for n, c in counts.items()])
    pred = (
        F.when((F.col("n_en") >= F.col("n_de")) & (F.col("n_en") >= F.col("n_fr"))
               & (F.col("n_en") > 0), F.lit("en"))
        .when((F.col("n_de") >= F.col("n_fr")) & (F.col("n_de") > 0), F.lit("de"))
        .when(F.col("n_fr") > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return d.withColumn("pred_lang", pred).orderBy("doc_id")


def _sql_wordlist(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


TEXT_LANGID_SQL = f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                       t -> t <> '') AS toks
    FROM documents
), d AS (
    SELECT doc_id,
           CAST(len(list_filter(toks, t -> t IN ({_sql_wordlist(LANG_STOPWORDS["en"])}))) AS BIGINT) AS n_en,
           CAST(len(list_filter(toks, t -> t IN ({_sql_wordlist(LANG_STOPWORDS["de"])}))) AS BIGINT) AS n_de,
           CAST(len(list_filter(toks, t -> t IN ({_sql_wordlist(LANG_STOPWORDS["fr"])}))) AS BIGINT) AS n_fr
    FROM tok
)
SELECT doc_id, n_en, n_de, n_fr,
       CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en > 0 THEN 'en'
            WHEN n_de >= n_fr AND n_de > 0 THEN 'de'
            WHEN n_fr > 0 THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM d ORDER BY doc_id
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text stats: whitespace + BPE-ish token counts,
    punctuation/stopword ratios, composite quality score, and the
    md5 fingerprint of the normalized text (rolling-hash document
    identity). One narrow pass over the scan — all per-row column
    math, no shuffle (subsumes the former separate ``text_tokens``
    and ``text_fingerprint`` registry entries)."""
    docs = _docs_spread(spark, sf_dir)
    n_chars = F.length("text").cast("long")
    n_tokens = count_matches(F.col("text"), r"\S+")
    n_bpe = count_matches(F.col("text"), BPE_RE)
    n_punct = count_matches(F.col("text"), r"[^A-Za-z0-9\s]")
    n_stop = count_matches(F.lower(F.col("text")), STOPWORDS_EN)
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0))
        * (F.lit(1.0) - punct_ratio)
        * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality_score"),
        F.md5(normalize_text(F.col("text"))).alias("fp"),
    ).orderBy("doc_id")


TEXT_QUALITY_SQL = f"""
WITH d AS (
    SELECT doc_id, text,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_EN}')) AS BIGINT) AS n_stop
    FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens,
       round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
       round(n_stop / greatest(n_tokens, 1), 4) AS stop_ratio,
       round(least(1.0, n_tokens / 50.0)
             * (1.0 - n_punct / greatest(n_chars, 1))
             * (0.5 + 0.5 * (n_stop / greatest(n_tokens, 1))), 4) AS quality_score,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
FROM d ORDER BY doc_id
"""


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf(term,doc) · ln(N/df(term)),
    deterministic tiebreak (score desc, term asc).

    Plan shape: one shuffle for tf (doc,term), one tiny shuffle for df
    (term), df joined back on term, corpus size N broadcast as a
    1-row frame, window on doc_id for the top-3. At 100 TB the df
    table is the only global state and it's per-term — millions of
    rows, broadcastable or shuffle-joined, never per-document."""
    docs = _docs_spread(spark, sf_dir)
    from last_minute_legends_spark.functions.text import words

    toks = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("term")
    )
    # tf feeds the df table, the corpus size, and the scoring branch —
    # persist once (LRU-evicted) instead of re-tokenizing per branch
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.select(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "rn", "term", F.round("score", 4).alias("score"))
        .orderBy("doc_id", "rn")
    )


TEXT_TFIDF_SQL = """
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
    SELECT count(DISTINCT doc_id) AS n_docs FROM tf
), scored AS (
    SELECT doc_id, term, tf * ln(n_docs::DOUBLE / df) AS score
    FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
    SELECT doc_id, term, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
    FROM scored
)
SELECT doc_id, rn, term, round(score, 4) AS score
FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
"""


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by document frequency then
    total count — the tokenizer-vocab build step of a training-data
    pipeline. One exploded shuffle on token; heavy hitters are exactly
    what the agg concentrates, so partial aggregation (map-side
    combine) does the flattening before the shuffle.

    The top-100 selection is ``orderBy(...).limit(100)``, which
    Catalyst compiles to TakeOrderedAndProject — per-partition
    top-100 heaps merged at the driver, NO single-partition sort.
    At a 100 TB corpus the vocabulary is billions of terms; a global
    row_number window here (the r3 formulation) would move every
    term's counts into one partition. Rank is implied by the sort
    order (df desc, tf_total desc, term asc), not materialized —
    plan-asserted window-free in tests/test_plans.py."""
    from last_minute_legends_spark.functions.text import words

    docs = _docs_spread(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf_total"),
    )
    return (
        counts.orderBy(F.desc("df"), F.desc("tf_total"), F.asc("term"))
        .limit(100)
        .select("term", "df", "tf_total")
    )


TEXT_VOCAB_SQL = """
WITH tok AS (
    SELECT doc_id,
           unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
    FROM documents
), counts AS (
    SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf_total
    FROM tok GROUP BY term
)
SELECT term, df, tf_total FROM counts
ORDER BY df DESC, tf_total DESC, term LIMIT 100
"""


def training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship COMPOSED pipeline: exact-dedup keep-list ∧ English
    ∧ quality threshold → the documents that would enter a training
    run. One fingerprint shuffle for keeper selection; everything else
    is narrow column math over the same scan."""
    docs = _docs_spread(spark, sf_dir)
    low = F.lower(F.col("text"))
    n_en = count_matches(low, STOPWORDS_EN)
    n_de = count_matches(low, STOPWORDS_DE)
    n_fr = count_matches(low, STOPWORDS_FR)
    is_en = (n_en >= n_de) & (n_en >= n_fr) & (n_en > 0)

    n_chars = F.length("text").cast("long")
    n_tokens = count_matches(F.col("text"), r"\S+")
    n_punct = count_matches(F.col("text"), r"[^A-Za-z0-9\s]")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_en / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(50.0))
        * (F.lit(1.0) - punct_ratio)
        * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    )

    from pyspark.sql import Window
    fp = F.md5(normalize_text(F.col("text")))
    keeper = F.min("doc_id").over(Window.partitionBy(fp))
    return (
        docs.select(
            "doc_id",
            F.round(score, 4).alias("quality_score"),
            is_en.alias("is_en"),
            (keeper == F.col("doc_id")).alias("is_keeper"),
        )
        .filter(F.col("is_en") & F.col("is_keeper")
                & (F.col("quality_score") >= 0.5))
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
    )


TRAINING_SET_SQL = f"""
WITH d AS (
    SELECT doc_id, text,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_EN}')) AS BIGINT) AS n_en,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_DE}')) AS BIGINT) AS n_de,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_FR}')) AS BIGINT) AS n_fr,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct,
           min(doc_id) OVER (
               PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
           ) AS keeper
    FROM documents
)
SELECT doc_id,
       round(least(1.0, n_tokens / 50.0)
             * (1.0 - n_punct / greatest(n_chars, 1))
             * (0.5 + 0.5 * (n_en / greatest(n_tokens, 1))), 4) AS quality_score
FROM d
WHERE n_en >= n_de AND n_en >= n_fr AND n_en > 0
  AND keeper = doc_id
  AND round(least(1.0, n_tokens / 50.0)
            * (1.0 - n_punct / greatest(n_chars, 1))
            * (0.5 + 0.5 * (n_en / greatest(n_tokens, 1))), 4) >= 0.5
ORDER BY doc_id
"""


def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/val assignment: bucket = positional
    ascii encoding of the first 3 hex chars of md5(doc_id) —
    ``(ascii(c1)*4096 + ascii(c2)*64 + ascii(c3)) mod 100`` —
    content-independent, stable across engines and runs, no RNG.
    Note the encoding is ascii-value arithmetic (NOT hex parsing:
    DuckDB lacks strtol/conv), so buckets are not perfectly uniform
    over hex digits; all 100 buckets are reachable and the measured
    train fraction is ~0.9004 (±2%-ish by corpus). At 100 TB this is
    THE split mechanism: pure column math, no sampling state,
    assignment survives re-partitioning and incremental appends."""
    docs = Catalog(spark, sf_dir).documents
    h = F.md5(F.col("doc_id").cast("string"))
    # hex-digit arithmetic instead of hex parsing: DuckDB has no
    # strtol/conv, but ascii(char) agrees everywhere
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 4096
        + F.ascii(F.substring(h, 2, 1)) * 64
        + F.ascii(F.substring(h, 3, 1))
    ).cast("long") % 100
    return (
        docs.select(
            "doc_id",
            bucket.alias("bucket"),
            F.when(bucket < 90, F.lit("train")).otherwise(F.lit("val")).alias("split"),
        )
        .orderBy("doc_id")
    )


TRAIN_VAL_SPLIT_SQL = """
WITH h AS (
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
)
SELECT doc_id,
       CAST((ascii(substring(hx, 1, 1)) * 4096
             + ascii(substring(hx, 2, 1)) * 64
             + ascii(substring(hx, 3, 1))) % 100 AS BIGINT) AS bucket,
       CASE WHEN (ascii(substring(hx, 1, 1)) * 4096
                  + ascii(substring(hx, 2, 1)) * 64
                  + ascii(substring(hx, 3, 1))) % 100 < 90
            THEN 'train' ELSE 'val' END AS split
FROM h
ORDER BY doc_id
"""


SPARK = {
    "text_langid": text_langid,
    "text_quality": text_quality,
    "text_tfidf_topterms": text_tfidf_topterms,
    "text_vocab_topk": text_vocab_topk,
    "training_set": training_set,
    "train_val_split": train_val_split,
}

SQL = {
    "training_set": TRAINING_SET_SQL,
    "train_val_split": TRAIN_VAL_SPLIT_SQL,
}

# r11: four long-proven entries (driver-hash-green through r10) lend
# their window slots so the 22 r10 lenders can rotate back; identical
# value-level compare runs locally via tests/test_oracle.py.
LOCAL_SQL = {
    "text_langid": TEXT_LANGID_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "text_tfidf_topterms": TEXT_TFIDF_SQL,
    "text_vocab_topk": TEXT_VOCAB_SQL,
}
