"""Corpus-curation queries over the ``documents`` table: PII
redaction, repetition signals, paragraph dedup, decontamination
(operators/curation.py).

Every entry here has a DuckDB value oracle in ``SQL``: r9 promoted
the seven curation oracles into the driver's 50-entry window and r10
promoted the remaining four (corpus_stats / text_unigram_logprob /
train_bpe / bpe_tokenize), so the external gate value-checks all of
them; tests/test_oracle.py runs the same rows+schema+values
comparison locally regardless of window membership.

The eval split for ``decontaminate`` is ``doc_id % 7 == 0`` — a
deterministic stand-in for a held-out benchmark table; swap in a
real eval DataFrame at the operator level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.text import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
)
from last_minute_legends_spark.operators.curation import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    SSN_RE,
    decontaminate,
    pack_shards,
    paragraph_dedup,
    pii_redact,
    repetition_signals,
)
from last_minute_legends_spark.sources.tables import Catalog, spread_cpu_scan


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan, round-robin spread for the regexp/tokenize-heavy
    curation passes (mixture_sample and corpus_stats stay on the plain
    scan — one md5/agg per row, the exchange costs more than it
    unlocks)."""
    return spread_cpu_scan(spark, Catalog(spark, sf_dir).documents)


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    return pii_redact(docs).orderBy("doc_id")


TEXT_PII_REDACT_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{SSN_RE}')) AS BIGINT) AS n_ssns,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       (len(regexp_extract_all(text, '{EMAIL_RE}'))
        + len(regexp_extract_all(text, '{SSN_RE}'))
        + len(regexp_extract_all(text, '{IPV4_RE}'))
        + len(regexp_extract_all(text, '{PHONE_RE}'))) = 0 AS pii_free,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{SSN_RE}', '<SSN>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM documents
ORDER BY doc_id
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    return repetition_signals(docs).orderBy("doc_id")


TEXT_REPETITION_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), m AS (
    SELECT doc_id,
           len(w) AS n_tokens,
           list_max(list_transform(list_distinct(w),
                                   x -> len(list_filter(w, y -> y = x)))) AS top_cnt,
           CASE WHEN len(w) >= 2
                THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                ELSE CAST([] AS VARCHAR[]) END AS g2,
           CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1),
                                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                ELSE CAST([] AS VARCHAR[]) END AS g3
    FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(top_cnt / greatest(n_tokens, 1), 4) AS top_word_frac,
       round((len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1), 4) AS dup_2gram_frac,
       round((len(g3) - len(list_distinct(g3))) / greatest(len(g3), 1), 4) AS dup_3gram_frac,
       (top_cnt / greatest(n_tokens, 1) > 0.20
        OR (len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1) > 0.40) AS repetitive
FROM m
ORDER BY doc_id
"""


def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    return paragraph_dedup(docs).orderBy("doc_id")


# The test corpus is single-paragraph documents, so corpus-level
# paragraph dedup degenerates to keep-first exact-text dedup here;
# the multi-paragraph semantics are exercised on crafted documents
# in tests/test_operators.py. Winner election keys on the
# normalized paragraph itself in SQL (Spark keys on its xxhash64 —
# identical result absent 64-bit collisions).
DEDUP_PARAGRAPH_SQL = r"""
WITH s AS (
    SELECT doc_id, string_split(text, chr(10) || chr(10)) AS paras FROM documents
), p0 AS (
    SELECT doc_id, paras, unnest(range(1, len(paras) + 1)) AS pos1 FROM s
), p AS (
    SELECT doc_id, CAST(pos1 - 1 AS INTEGER) AS pos, paras[CAST(pos1 AS INTEGER)] AS para,
           lower(trim(regexp_replace(paras[CAST(pos1 AS INTEGER)], '\s+', ' ', 'g'))) AS nk
    FROM p0
), k AS (
    SELECT doc_id, pos, para,
           row_number() OVER (PARTITION BY nk ORDER BY doc_id, pos) = 1 AS keep
    FROM p
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN keep THEN para END, chr(10) || chr(10)
                           ORDER BY pos), '') AS text_deduped,
       count(*) AS n_paragraphs,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
FROM k
GROUP BY doc_id
ORDER BY doc_id
"""


def decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    eval_set = docs.filter(F.col("doc_id") % 7 == 0)
    return decontaminate(train, eval_set, n=8).orderBy("doc_id")


DECONTAMINATE_SQL = r"""
WITH t AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), g AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 8
                THEN list_distinct(list_transform(range(1, len(w) - 6),
                                                  i -> array_to_string(w[i:i+7], ' ')))
                ELSE CAST([] AS VARCHAR[]) END AS sh
    FROM t
), e AS (
    SELECT doc_id, unnest(sh) AS s FROM g
), hits AS (
    SELECT tr.doc_id AS doc_id,
           count(DISTINCT tr.s) AS n_shared_ngrams,
           count(DISTINCT ev.doc_id) AS n_eval_docs
    FROM (SELECT * FROM e WHERE doc_id % 7 <> 0) tr
    JOIN (SELECT * FROM e WHERE doc_id % 7 = 0) ev ON tr.s = ev.s
    GROUP BY 1
)
SELECT d.doc_id,
       coalesce(n_shared_ngrams, 0) AS n_shared_ngrams,
       coalesce(n_eval_docs, 0) AS n_eval_docs,
       coalesce(n_shared_ngrams, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""


FUZZY_DECONT_THRESHOLD = 0.8


def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination: train documents that are NEAR-duplicates
    (true 3-shingle Jaccard ≥ 0.8) of an eval document — catching the
    lightly-edited benchmark copies exact n-gram matching
    (``decontaminate``) misses. Built on the asymmetric broadcast LSH
    (operators/dedup.py::minhash_lsh_cross): the eval side's band
    rows and shingles broadcast, the train corpus crosses the wire
    once as signature partials and never self-joins — the shape that
    survives a 100 TB train corpus against a few-thousand-doc eval
    suite.

    This is the PRODUCTION form (JVM xxhash64, whole-stage codegen —
    measured 1.5-1.6× faster than the md5 replay at sf0.1, A/B'd in
    BASELINE_LOCAL r14), following the dedup_minhash_lsh split: the
    headline/bench cell times the hot path, while
    ``decontaminate_fuzzy_replay`` runs the identical pipeline with
    the portable md5 hash under a full DuckDB value oracle, and
    tests/test_fuzzy_decont.py locks output parity between the two,
    so the gate's value check covers this form transitively."""
    from last_minute_legends_spark.operators.dedup import minhash_lsh_cross

    # plain scan, NOT _docs_spread: minhash_lsh_cross's _shingle_sets
    # does its own by-id spread, and a round-robin exchange in front of
    # it would shuffle the raw corpus text twice back-to-back (the
    # dedup_minhash_lsh entries pass the plain scan for the same
    # reason)
    docs = Catalog(spark, sf_dir).documents
    train = docs.filter(F.col("doc_id") % 7 != 0)
    eval_set = docs.filter(F.col("doc_id") % 7 == 0)
    return minhash_lsh_cross(
        train, eval_set, threshold=FUZZY_DECONT_THRESHOLD,
    ).orderBy("doc_id", "ref_doc_id")


def decontaminate_fuzzy_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``decontaminate_fuzzy`` with the portable md5-prefix hash
    injected — bit-identical signatures → band keys → candidates →
    exact-Jaccard verify in Spark AND DuckDB, so the driver gate
    value-checks the entire asymmetric LSH arithmetic
    (DECONTAMINATE_FUZZY_SQL). The dedup_minhash_lsh_replay pattern:
    this twin carries the oracle, the production entry carries the
    hot path, and tests/test_fuzzy_decont.py locks their parity."""
    from last_minute_legends_spark.functions.portable_hash import (
        concat_band_key, md5_perm_hash,
    )
    from last_minute_legends_spark.operators.dedup import minhash_lsh_cross

    docs = Catalog(spark, sf_dir).documents
    train = docs.filter(F.col("doc_id") % 7 != 0)
    eval_set = docs.filter(F.col("doc_id") % 7 == 0)
    return minhash_lsh_cross(
        train, eval_set, threshold=FUZZY_DECONT_THRESHOLD,
        perm_hash=md5_perm_hash, band_hash=concat_band_key,
    ).orderBy("doc_id", "ref_doc_id")


def _fuzzy_decont_sql() -> str:
    """The asymmetric pipeline's oracle IS the shared banded-LSH
    replay (plans/dedup_q.py::banded_lsh_replay_sql — one home for
    the shingle/signature/band generators, so the symmetric and
    asymmetric oracles cannot drift) with the candidate join
    restricted to train×eval by the %7 split: signatures depend only
    on a doc's own shingles, so splitting before or after signing is
    equivalent."""
    from last_minute_legends_spark.plans.dedup_q import (
        banded_lsh_replay_sql,
    )

    return banded_lsh_replay_sql(
        "a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0",
        "doc_id", "ref_doc_id", FUZZY_DECONT_THRESHOLD)


DECONTAMINATE_FUZZY_SQL = _fuzzy_decont_sql()


def curated_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation flagship: every gate a pretraining pipeline
    applies before a document reaches the tokenizer —

      exact-dedup keeper ∧ English ∧ quality ≥ 0.5   (= training_set)
      ∧ not repetitive ∧ PII-free ∧ not contaminated ∧ not eval

    All per-document signals (quality, language, repetition, PII)
    are computed in ONE narrow projection over a single scan — no
    self-joins of per-signal frames. The keeper-election window then
    shuffles only (doc_id, fp, two booleans, a double), never the
    text, and the only other exchange is the contamination join.
    """
    from last_minute_legends_spark.functions.text import (
        count_matches, normalize_text, words,
    )
    from last_minute_legends_spark.operators.curation import (
        pii_free_col, repetition_fracs,
    )
    from pyspark.sql import Window

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
    top_frac, dup2 = repetition_fracs(F.col("_w"))
    sig = docs.select(
        "doc_id", "text", words(F.col("text")).alias("_w")
    ).select(
        "doc_id",
        F.md5(normalize_text(F.col("text"))).alias("fp"),
        F.round(score, 4).alias("quality_score"),
        is_en.alias("is_en"),
        ((top_frac > 0.20) | (dup2 > 0.40)).alias("repetitive"),
        pii_free_col(F.col("text")).alias("pii_free"),
    )
    keeper = F.min("doc_id").over(Window.partitionBy("fp"))

    train = docs.filter(F.col("doc_id") % 7 != 0)
    eval_set = docs.filter(F.col("doc_id") % 7 == 0)
    cont = decontaminate(train, eval_set, n=8).select("doc_id", "contaminated")
    return (
        sig.withColumn("is_keeper", keeper == F.col("doc_id"))
        .join(cont, "doc_id")
        .filter(
            F.col("is_en") & F.col("is_keeper")
            & (F.col("quality_score") >= 0.5)
            & ~F.col("repetitive") & F.col("pii_free")
            & ~F.col("contaminated")
        )
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
    )


def _curated_sql(dedup_gate: bool) -> str:
    """DuckDB replay of the curation gates. ``dedup_gate=True`` is the
    batch flagship (exact-dedup keeper election included);
    ``dedup_gate=False`` is the STATELESS gate set — exactly what the
    streaming curation path (streaming/curate.py curation_gate) can
    apply in-flight, used as its cross-engine oracle by
    tests/test_stream_oracle.py."""
    keeper_gate = "AND keeper = doc_id\n  " if dedup_gate else ""
    return rf"""
WITH d AS (
    SELECT doc_id, text,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_EN}')) AS BIGINT) AS n_en,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_DE}')) AS BIGINT) AS n_de,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_FR}')) AS BIGINT) AS n_fr,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
           min(doc_id) OVER (
               PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
           ) AS keeper,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w,
           (len(regexp_extract_all(text, '{EMAIL_RE}'))
            + len(regexp_extract_all(text, '{SSN_RE}'))
            + len(regexp_extract_all(text, '{IPV4_RE}'))
            + len(regexp_extract_all(text, '{PHONE_RE}'))) = 0 AS pii_free
    FROM documents
), r AS (
    SELECT doc_id,
           list_max(list_transform(list_distinct(w),
                                   x -> len(list_filter(w, y -> y = x))))
               / greatest(len(w), 1) AS top_frac,
           CASE WHEN len(w) >= 2 THEN
               (len(w) - 1
                - len(list_distinct(list_transform(range(1, len(w)),
                                                   i -> w[i] || ' ' || w[i+1]))))
                   / greatest(len(w) - 1, 1)
               ELSE 0 END AS dup2
    FROM d
), g AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 8
                THEN list_distinct(list_transform(range(1, len(w) - 6),
                                                  i -> array_to_string(w[i:i+7], ' ')))
                ELSE CAST([] AS VARCHAR[]) END AS sh
    FROM d
), e AS (
    SELECT doc_id, unnest(sh) AS s FROM g
), cont AS (
    SELECT DISTINCT tr.doc_id
    FROM (SELECT * FROM e WHERE doc_id % 7 <> 0) tr
    JOIN (SELECT * FROM e WHERE doc_id % 7 = 0) ev ON tr.s = ev.s
)
SELECT d.doc_id,
       round(least(1.0, n_tokens / 50.0)
             * (1.0 - n_punct / greatest(n_chars, 1))
             * (0.5 + 0.5 * (n_en / greatest(n_tokens, 1))), 4) AS quality_score
FROM d JOIN r USING (doc_id)
WHERE n_en >= n_de AND n_en >= n_fr AND n_en > 0
  {keeper_gate}AND round(least(1.0, n_tokens / 50.0)
            * (1.0 - n_punct / greatest(n_chars, 1))
            * (0.5 + 0.5 * (n_en / greatest(n_tokens, 1))), 4) >= 0.5
  AND NOT (r.top_frac > 0.20 OR r.dup2 > 0.40)
  AND pii_free
  AND d.doc_id % 7 <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM cont)
ORDER BY d.doc_id
"""


CURATED_TRAINING_SET_SQL = _curated_sql(dedup_gate=True)
# Oracle for the STREAMING curation entry: identical gates minus the
# keeper election (exact dedup is stateful; the in-flight plan is
# deliberately stateless — see streaming/curate.py).
STREAM_CURATE_ORACLE_SQL = _curated_sql(dedup_gate=False)


# 8 full-batch steps at lr=4 measured AUC 0.9522 against the held-out
# repetition label at sf0.01 (identical AUC at 16/24 steps — the
# separation is already linear in the features); spread 0.015-0.072
# reflects the 1.4% positive rate
QM_ITERS = 8
QM_LR = 4.0


def text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED quality scorer (the C4/fastText-filter pattern): a tiny
    logistic regression fit DISTRIBUTEDLY on heuristic signals (x1 =
    length saturation, x2 = punctuation ratio, x3 = stopword ratio),
    label = the HELD-OUT Gopher repetition flag (top_frac > 0.20 ∨
    dup2 > 0.40) — a signal computed from word-duplication structure
    that is NOT a function of the three features, so the model must
    learn a real correlation (r16, VERDICT r15 #6: the previous label
    was the stateless curation gate, which embeds round(score(x1,x2,
    x3)) ≥ 0.5 — the scorer could only re-derive the heuristics it
    was fed). Trained on the doc_id % 2 == 0 split, scored over every
    document as a pure column dot product + sigmoid (narrow, codegen
    — no UDF anywhere). Measured AUC 0.9522 against the held-out
    label at sf0.01.

    The fit is operators/curation.py::logistic_fit: fixed iterations,
    fixed learning rate, each step one map-side-combined aggregate
    job, the driver touching only the 4-float coefficient vector per
    step (the Lloyd pattern), every iterate rounded to 6 decimals so
    the coefficients are bit-reproducible across engines — which is
    what lets the DuckDB oracle REPLAY THE ENTIRE TRAINING LOOP as
    chained 1-row CTEs and value-check fit + scoring end-to-end.
    Distributed-vs-local-numpy fit parity is locked in
    tests/test_operators.py."""
    from last_minute_legends_spark.functions.text import (
        count_matches, words,
    )
    from last_minute_legends_spark.operators.curation import (
        logistic_fit, repetition_fracs,
    )

    docs = _docs_spread(spark, sf_dir)
    low = F.lower(F.col("text"))
    n_en = count_matches(low, STOPWORDS_EN)
    n_chars = F.length("text").cast("long")
    n_tokens = count_matches(F.col("text"), r"\S+")
    n_punct = count_matches(F.col("text"), r"[^A-Za-z0-9\s]")
    x1 = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    x2 = n_punct / F.greatest(n_chars, F.lit(1))
    x3 = n_en / F.greatest(n_tokens, F.lit(1))
    # the label the features can't reconstruct by definition: word-
    # duplication structure, not length/punct/stopword arithmetic
    top_frac, dup2 = repetition_fracs(F.col("_w"))
    y = (top_frac > 0.20) | (dup2 > 0.40)
    sig = docs.select(
        "doc_id", "text", words(F.col("text")).alias("_w")
    ).select(
        "doc_id", x1.alias("x1"), x2.alias("x2"), x3.alias("x3"),
        y.cast("double").alias("y"),
    ).persist()  # one scan per GD iteration + the scoring pass
    w = logistic_fit(sig.filter(F.col("doc_id") % 2 == 0),
                     ["x1", "x2", "x3"], "y", iters=QM_ITERS, lr=QM_LR)
    z = (F.lit(w[0]) + F.lit(w[1]) * F.col("x1")
         + F.lit(w[2]) * F.col("x2") + F.lit(w[3]) * F.col("x3"))
    # eager materialize + unpersist sig: persist hygiene across the
    # driver's 116-entry single-session sweep (VERDICT r16 #6)
    out = sig.select(
        "doc_id",
        F.col("y").cast("long").alias("label"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
        .alias("model_score"),
    ).orderBy("doc_id").localCheckpoint(eager=True)
    sig.unpersist()
    return out


def _quality_model_sql(iters: int = QM_ITERS, lr: float = QM_LR) -> str:
    """The FULL training loop as SQL: signals → label → w0 = 0 →
    ``iters`` chained (gradient-aggregate, coefficient-update) 1-row
    CTE pairs — each update rounded to 6dp exactly like logistic_fit,
    so both engines re-enter every step from identical coefficients —
    → final per-doc sigmoid scoring. Any drift anywhere in the fit
    (a gradient term, the split, the rounding, the learning rate)
    value-mismatches the scored frame."""
    z = "(b + c1 * x1 + c2 * x2 + c3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{z})))"
    parts = [rf"""
WITH d AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_EN}')) AS BIGINT) AS n_en,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS n_punct,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), r AS (
    SELECT doc_id,
           list_max(list_transform(list_distinct(w),
                                   x -> len(list_filter(w, y -> y = x))))
               / greatest(len(w), 1) AS top_frac,
           CASE WHEN len(w) >= 2 THEN
               (len(w) - 1
                - len(list_distinct(list_transform(range(1, len(w)),
                                                   i -> w[i] || ' ' || w[i+1]))))
                   / greatest(len(w) - 1, 1)
               ELSE 0 END AS dup2
    FROM d
), sig AS MATERIALIZED (
    SELECT doc_id,
           least(1.0, n_tokens / 50.0) AS x1,
           n_punct / greatest(n_chars, 1) AS x2,
           n_en / greatest(n_tokens, 1) AS x3,
           -- held-out label (r16): the Gopher repetition flag — NOT a
           -- function of x1/x2/x3, so the fit learns a correlation
           -- instead of re-deriving its own inputs
           CASE WHEN top_frac > 0.20 OR dup2 > 0.40
            THEN 1.0 ELSE 0.0 END AS y
    FROM d JOIN r USING (doc_id)
), w0 AS (
    SELECT 0.0 AS b, 0.0 AS c1, 0.0 AS c2, 0.0 AS c3
)"""]
    # MATERIALIZED is load-bearing: DuckDB re-evaluates plain CTEs per
    # reference, and w{t} referencing both w{t-1} and g{t}(sig, w{t-1})
    # makes the chain re-evaluate EXPONENTIALLY (2^iters scans of the
    # documents parquet — "Too many open files" at 16 steps, measured)
    for t in range(1, iters + 1):
        parts.append(f""", g{t} AS MATERIALIZED (
    SELECT avg({p} - y) AS gb,
           avg(({p} - y) * x1) AS g1,
           avg(({p} - y) * x2) AS g2,
           avg(({p} - y) * x3) AS g3
    FROM sig, w{t - 1} WHERE doc_id % 2 = 0
), w{t} AS MATERIALIZED (
    SELECT round(b - {lr} * gb, 6) AS b, round(c1 - {lr} * g1, 6) AS c1,
           round(c2 - {lr} * g2, 6) AS c2, round(c3 - {lr} * g3, 6) AS c3
    FROM w{t - 1}, g{t}
)""")
    parts.append(f"""
SELECT doc_id, CAST(y AS BIGINT) AS label,
       round({p}, 4) AS model_score
FROM sig, w{iters} ORDER BY doc_id""")
    return "".join(parts)


TEXT_QUALITY_MODEL_SQL = _quality_model_sql()


def pack_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_spread(spark, sf_dir)
    return pack_shards(docs, budget_tokens=256).orderBy("doc_id")


PACK_SHARDS_SQL = r"""
WITH t AS (
    SELECT doc_id, source AS part,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
    FROM documents
), s AS (
    SELECT doc_id, part, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY part ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_pos
    FROM t
)
SELECT doc_id, part, n_tokens, start_pos,
       CAST(floor(start_pos / 256) AS BIGINT) AS shard
FROM s
ORDER BY doc_id
"""


GS_SEED = "shuffle-v1"
GS_SHARDS = 16


def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle + shard assignment
    (operators/sampling.py::global_shuffle) over the documents table
    — the epoch-order producer that complements pack_shards'
    sequential token packing. Portable md5 keying, so the DuckDB
    oracle replays the permutation bit-for-bit."""
    from last_minute_legends_spark.operators.sampling import global_shuffle

    docs = Catalog(spark, sf_dir).documents
    return global_shuffle(docs, seed=GS_SEED,
                          n_shards=GS_SHARDS).orderBy("doc_id")


GLOBAL_SHUFFLE_SQL = f"""
WITH k AS (
    SELECT doc_id,
           ('0x' || substr(md5('{GS_SEED}:' || CAST(doc_id AS VARCHAR)),
                           1, 15))::UBIGINT::BIGINT AS skey
    FROM documents
)
SELECT doc_id, skey % {GS_SHARDS} AS shard,
       row_number() OVER (PARTITION BY skey % {GS_SHARDS}
                          ORDER BY skey, doc_id) AS pos
FROM k
ORDER BY doc_id
"""


def mixture_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain-mixture rebalancing. The synthetic corpus has
    perfectly balanced sources (uniform weights would degenerate to
    keep-all), so the registry entry derives a non-uniform target
    from the source name itself — weight 1 + (ascii of last char mod
    3) ∈ {1,2,3} — which the SQL oracle reproduces exactly. Explicit
    weight dicts (incl. 0-weight drops) are unit-tested in
    tests/test_operators.py."""
    from last_minute_legends_spark.operators.sampling import mixture_sample

    docs = Catalog(spark, sf_dir).documents
    w = F.lit(1.0) + F.pmod(F.ascii(F.col("source").substr(F.length("source"), F.lit(1))), F.lit(3))
    return mixture_sample(docs, weights=w).orderBy("doc_id")


MIXTURE_SAMPLE_SQL = r"""
WITH c AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           1.0 + (ascii(substring(source, length(source), 1)) % 3) AS w
    FROM documents GROUP BY source
), m AS (
    SELECT min(n / w) AS t FROM c
), r AS (
    SELECT source, least(w * t / n, 1.0) AS rate FROM c, m
)
SELECT d.doc_id, d.source, round(rate, 6) AS rate
FROM documents d JOIN r USING (source)
WHERE rate >= 1.0
   OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < lpad(lower(to_hex(CAST(floor(rate * 4294967296.0) AS BIGINT))), 8, '0')
ORDER BY doc_id
"""


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the summary a data curator publishes
    with a corpus release. One groupBy pass — every agg (count, sum,
    countDistinct, avg, exact percentile) partial-aggregates
    map-side, so the corpus shuffles k source-groups, not rows."""
    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).cast("long")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(n_tokens).cast("long").alias("total_tokens"),
            F.count_distinct("lang").alias("n_langs"),
            F.round(F.avg(n_tokens), 2).alias("avg_tokens"),
            F.round(F.percentile("n_chars", 0.5), 2).alias("p50_chars"),
            F.round(F.percentile("n_chars", 0.9), 2).alias("p90_chars"),
        )
        .orderBy("source")
    )


CORPUS_STATS_SQL = r"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(avg(len(regexp_extract_all(text, '\S+'))), 2) AS avg_tokens,
       round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 2) AS p90_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram-LM scoring (the KenLM-shaped quality
    signal, reduced to order 1 so it is exactly SQL-checkable):
    token frequencies over the whole corpus, then each document
    scored by its mean negative log-likelihood and perplexity.

    Plan: one explode -> vocab agg (map-side combinable; Heaps' law
    keeps the vocab sublinear in corpus size, so it broadcasts even
    when the corpus is 100 TB) -> broadcast-join scoring pass ->
    per-doc agg. The corpus shuffles once, on doc_id, for the final
    agg; with documents already hash-partitioned by doc_id even that
    exchange disappears.
    """
    from last_minute_legends_spark.functions.text import words

    docs = _docs_spread(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    total = freq.agg(F.sum("c").alias("tot"))
    neg_ll = F.avg(-F.log(F.col("c") / F.col("tot")))
    return (
        tok.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(neg_ll, 4).alias("avg_neg_logprob"),
            F.round(F.exp(F.round(neg_ll, 4)), 2).alias("ppl"),
        )
        .orderBy("doc_id")
    )


TEXT_UNIGRAM_SQL = r"""
WITH t AS (
    SELECT doc_id,
           unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
    FROM documents
), f AS (
    SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY tok
), tot AS (
    SELECT sum(c) AS tot FROM f
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(c / tot)), 4) AS avg_neg_logprob,
       round(exp(round(avg(-ln(c / tot)), 4)), 2) AS ppl
FROM t JOIN f USING (tok), tot
GROUP BY doc_id
ORDER BY doc_id
"""


# Interpolation weight for the bigram LM: p = λ·p(w2|w1) + (1-λ)·p(w2).
# 0.75 is exactly representable in binary, so Spark and DuckDB compute
# bit-identical probabilities.
BIGRAM_LAMBDA = 0.75

# Broadcast/shuffle gate for the bigram-table scoring join. The
# unigram vocab is Heaps-sublinear and always broadcasts; the BIGRAM
# table is the first LM state that outgrows a broadcast at corpus
# scale (Heaps-regime growth in corpus size), so the join adapts: a
# table at or under this many distinct bigrams is broadcast, above it
# the scoring join shuffles on (w1, w2) — the DELTA_STATIC_MAX
# size-gate discipline applied to a join strategy. MEASURED (r17
# forced-regime ladder cells, scale_local.json): broadcast beats the
# shuffle at every mult this box holds — x10 4.2 vs 4.5 s, x30
# (5.6M bigrams) 9.2 vs 10.8, x100 (16.18M bigrams) 23.8 vs 42.0 —
# the hash-map build is cheaper than shuffling the corpus-sized
# exploded token stream, the classic broadcast-join rule. The gate
# is therefore a MEMORY cap, not a speed crossover: at 16M+ rows of
# string pairs the broadcast is GiB-scale per executor, the regime
# where a real cluster OOMs. The x100 corpus lands just past it
# (auto ran the shuffle there, 35.9 s — faster than the forced
# shuffle's 42.0 because the gate's count() leaves c2 cached).
BIGRAM_BROADCAST_MAX = 16_000_000


def _bigram_logprob(spark: SparkSession, sf_dir: str,
                    broadcast_max: int = BIGRAM_BROADCAST_MAX) -> DataFrame:
    from last_minute_legends_spark.functions.text import words

    docs = _docs_spread(spark, sf_dir)
    arr = docs.select("doc_id", words(F.col("text")).alias("w"))
    n = F.size("w")
    pair = F.zip_with(
        F.slice("w", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("w", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bg = (arr.select("doc_id", F.explode(pair).alias("b"))
          .select("doc_id", "b.w1", "b.w2"))
    tok = arr.select(F.explode("w").alias("tok"))
    c1 = tok.groupBy("tok").agg(F.count("*").cast("double").alias("c1"))
    total = c1.agg(F.sum("c1").alias("tot"))
    c2 = bg.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c2")).persist()

    # size-gated join strategy (see BIGRAM_BROADCAST_MAX): a full
    # count() on the PERSISTED c2, not a limit-probe — the scoring
    # join needs all of c2 regardless, so the count materializes the
    # cache the join then reuses, while a limit(n).count() probe
    # short-circuits and leaves the cache partial (measured at x100:
    # the limit-probe form re-derived c2 for the broadcast and read
    # 70.6 s where the probe-free broadcast reads 23.8 s)
    if broadcast_max >= (1 << 31) - 1 \
            or c2.count() <= broadcast_max:
        c2_side = F.broadcast(c2)
    else:
        c2_side = c2
    ctx = c1.select(F.col("tok").alias("w1"), F.col("c1").alias("cctx"))
    uni = c1.select(F.col("tok").alias("w2"), F.col("c1").alias("cuni"))
    p = (F.lit(BIGRAM_LAMBDA) * (F.col("c2") / F.col("cctx"))
         + F.lit(1.0 - BIGRAM_LAMBDA) * (F.col("cuni") / F.col("tot")))
    neg_ll = F.avg(-F.log(p))
    out = (
        bg.join(c2_side, ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(uni), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(neg_ll, 4).alias("avg_neg_logprob"),
            F.round(F.exp(F.round(neg_ll, 4)), 2).alias("ppl"),
        )
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    c2.unpersist()
    return out


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained INTERPOLATED BIGRAM-LM scoring (r17, VERDICT
    r16 #3 — the KenLM order-2 shape): each document's mean negative
    log-likelihood and perplexity under
    p(w2|w1) = λ·c(w1,w2)/c(w1) + (1-λ)·c(w2)/N, trained on the
    corpus itself. Where the unigram entry's model state always
    broadcasts (Heaps-sublinear vocab), the bigram table is the first
    LM state that CAN'T at 100 TB — the scoring join is therefore
    size-gated between broadcast and a shuffle on (w1, w2)
    (BIGRAM_BROADCAST_MAX, crossover measured in the r17 ladder's
    forced-regime cells, not asserted).

    Plan: one narrow pass builds per-doc bigram structs via
    slice+zip_with (no positional self-join, no window), one
    map-side-combinable agg each for c2/c1, then the adaptive scoring
    join and a final per-doc agg. Docs with fewer than two tokens
    have no bigrams and drop out (the oracle's join does the same).
    Oracle: full DuckDB replay (TEXT_BIGRAM_SQL) — same tokenizer,
    same interpolation arithmetic, 4dp/2dp rounding on both engines."""
    return _bigram_logprob(spark, sf_dir)


TEXT_BIGRAM_SQL = rf"""
WITH d AS (
    SELECT doc_id,
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
    FROM documents
), bg AS (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
    FROM d, UNNEST(generate_series(1, len(w) - 1)) t(i)
), c2 AS (
    SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2 FROM bg GROUP BY w1, w2
), t AS (
    SELECT unnest(w) AS tok FROM d
), c1 AS (
    SELECT tok, CAST(count(*) AS DOUBLE) AS c1 FROM t GROUP BY tok
), tot AS (
    SELECT sum(c1) AS tot FROM c1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln({BIGRAM_LAMBDA} * (c2 / ctx.c1) + {1.0 - BIGRAM_LAMBDA} * (uni.c1 / tot))), 4) AS avg_neg_logprob,
       round(exp(round(avg(-ln({BIGRAM_LAMBDA} * (c2 / ctx.c1) + {1.0 - BIGRAM_LAMBDA} * (uni.c1 / tot))), 4)), 2) AS ppl
FROM bg
JOIN c2 USING (w1, w2)
JOIN c1 ctx ON bg.w1 = ctx.tok
JOIN c1 uni ON bg.w2 = uni.tok, tot
GROUP BY doc_id
ORDER BY doc_id
"""


def train_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BPE merge table (operators/bpe.py): 16 merge
    rounds over the word-frequency table. Iterative by nature →
    rows-only externally; exact merge sequences are asserted on
    planted corpora in tests/test_operators.py."""
    from last_minute_legends_spark.operators.bpe import train_bpe

    docs = _docs_spread(spark, sf_dir)
    merges = train_bpe(docs, n_merges=16)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["count"])
         for m in merges],
        "rank long, left string, right string, merged string, count long",
    ).orderBy("rank")


def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a freshly trained merge table: the
    train→encode round trip a tokenizer pipeline runs. Encoding
    folds merges once per DISTINCT word and broadcast-joins token
    arrays back — the corpus is scanned once.

    ``head_tokens`` is rendered as a space-joined STRING, not an
    array: the driver gate canonicalizes results with pandas, and
    list-valued cells are unhashable there (the r10 red row —
    ``TypeError: unhashable type: 'list'``). BPE symbols never
    contain whitespace (words are split on it upstream), so the
    join is lossless."""
    from last_minute_legends_spark.operators.bpe import bpe_encode, train_bpe

    docs = _docs_spread(spark, sf_dir)
    merges = train_bpe(docs, n_merges=16)
    return (
        bpe_encode(docs, merges)
        .select("doc_id", "n_tokens",
                F.concat_ws(" ", F.slice("tokens", 1, 8)).alias("head_tokens"))
        .orderBy("doc_id")
    )


def _bpe_oracle_ctes(n_merges: int = 16, min_count: int = 2) -> str:
    """Generate the DuckDB CTE chain that replays BPE training
    exactly: 16 unrolled rounds of (pair-count -> argmax -> greedy
    merge fold), matching operators/bpe.py semantics symbol for
    symbol.

    The merge application MUST be a true left-to-right sequential
    fold (the recursive fold{k} CTEs walk one symbol position per
    iteration): a replace-until-fixpoint string rewrite looks
    equivalent but diverges on runs — e.g. merging ('a','a') over
    six a's gives [aa,aa,aa] under the fold but [aa,a,aa,a] under
    non-overlapping replace, because the fold lets a symbol consumed
    as a merge's RIGHT never start the next pair while replace
    re-scans from a shared boundary.

    Early stop parity: top{k} keeps only pairs with cnt >=
    ``min_count``; when it is empty the scalar subqueries are NULL,
    every CASE falls to the no-merge branch, the state freezes, and
    all later rounds stay empty — exactly train_bpe's break."""
    norm = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
    # Every state{k} is referenced twice by round k+1 (pair counting
    # and the fold) — DuckDB inlines CTEs by default, which would
    # expand state16 into 2^16 scans of the base table ("too many
    # open files" long before any result). MATERIALIZED pins each
    # round's state to one evaluation, the same shape as Spark's
    # per-round localCheckpoint.
    parts = [f"""wf AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split({norm}, ' ')) AS word FROM documents)
    WHERE length(word) > 0 GROUP BY word
), state0 AS MATERIALIZED (
    SELECT word, freq,
           list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
    FROM wf
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f"""pairs{k} AS (
    SELECT s.syms[i] AS l, s.syms[i+1] AS r, CAST(sum(s.freq) AS BIGINT) AS cnt
    FROM state{p} s, unnest(generate_series(1, len(s.syms) - 1)) t(i)
    GROUP BY 1, 2
), top{k} AS (
    SELECT l, r, cnt FROM pairs{k}
    WHERE cnt >= {min_count}
    ORDER BY cnt DESC, l, r LIMIT 1
), fold{k}(word, freq, syms, i, acc) AS (
    SELECT word, freq, syms, 1, [syms[1]] FROM state{p}
    UNION ALL
    SELECT f.word, f.freq, f.syms, f.i + 1,
           CASE WHEN f.acc[len(f.acc)] = (SELECT l FROM top{k})
                 AND f.syms[f.i+1] = (SELECT r FROM top{k})
                THEN list_append(f.acc[1:len(f.acc)-1],
                                 (SELECT l || r FROM top{k}))
                ELSE list_append(f.acc, f.syms[f.i+1]) END
    FROM fold{k} f WHERE f.i < len(f.syms)
), state{k} AS MATERIALIZED (
    SELECT word, freq, acc AS syms FROM fold{k} WHERE i = len(syms)
)""")
    return ",\n".join(parts)


_BPE_N_MERGES = 16

TRAIN_BPE_SQL = (
    "WITH RECURSIVE\n" + _bpe_oracle_ctes(_BPE_N_MERGES) + "\n"
    + "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f'SELECT CAST({k - 1} AS BIGINT) AS rank, l AS "left", r AS "right", '
        f'l || r AS merged, cnt AS "count" FROM top{k}'
        for k in range(1, _BPE_N_MERGES + 1))
    + "\n) ORDER BY rank"
)

BPE_TOKENIZE_SQL = (
    "WITH RECURSIVE\n" + _bpe_oracle_ctes(_BPE_N_MERGES) + f""",
docw AS (
    SELECT doc_id, i AS pos, ws[i] AS word
    FROM (SELECT doc_id,
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS ws
          FROM documents),
         unnest(generate_series(1, len(ws))) t(i)
    WHERE length(ws[i]) > 0
), enc AS (
    SELECT d.doc_id, flatten(list(s.syms ORDER BY d.pos)) AS tokens
    FROM docw d JOIN state{_BPE_N_MERGES} s USING (word)
    GROUP BY d.doc_id
)
SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
       array_to_string(tokens[1:8], ' ') AS head_tokens
FROM enc ORDER BY doc_id"""
)


SPARK = {
    "text_pii_redact": text_pii_redact,
    "text_repetition": text_repetition,
    "dedup_paragraph": dedup_paragraph,
    "decontaminate": decontaminate_train,
    "decontaminate_fuzzy": decontaminate_fuzzy,
    "decontaminate_fuzzy_replay": decontaminate_fuzzy_replay,
    "curated_training_set": curated_training_set,
    "pack_shards": pack_training_shards,
    "mixture_sample": mixture_sample_weighted,
    "global_shuffle": global_shuffle_shards,
    "corpus_stats": corpus_stats,
    "text_unigram_logprob": text_unigram_logprob,
    "text_bigram_logprob": text_bigram_logprob,
    "train_bpe": train_bpe_merges,
    "bpe_tokenize": bpe_tokenize,
    "text_quality_model": text_quality_model,
}

# r12: the nine entries r11 demoted (to give the BPE pair their
# post-fix observation — both green in CORRECTNESS_r11) rotate BACK
# into the driver window for a current external observation, on slots
# lent by twelve multi-round-green OLAP entries (plans/olap.py). The
# BPE pair stays in the window too: its DuckDB replay (16 unrolled
# rounds of recursive-CTE greedy folds, _bpe_oracle_ctes) is the
# family's only external value check.
SQL = {
    "text_pii_redact": TEXT_PII_REDACT_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "dedup_paragraph": DEDUP_PARAGRAPH_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    # r14 split (the dedup_minhash_lsh pattern): the production
    # xxhash64 form is rows-only at the gate (xxhash64 exists in no
    # second engine); the md5 twin carries the full value oracle and
    # tests/test_fuzzy_decont.py locks their output parity
    "decontaminate_fuzzy": None,
    "decontaminate_fuzzy_replay": DECONTAMINATE_FUZZY_SQL,
    "curated_training_set": CURATED_TRAINING_SET_SQL,
    "pack_shards": PACK_SHARDS_SQL,
    "mixture_sample": MIXTURE_SAMPLE_SQL,
    # r17b: seeded reproducible epoch shuffle — portable md5
    # permutation replayed exactly
    "global_shuffle": GLOBAL_SHUFFLE_SQL,
    "corpus_stats": CORPUS_STATS_SQL,
    "text_unigram_logprob": TEXT_UNIGRAM_SQL,
    # r17: the order-2 LM — full interpolated-probability replay
    "text_bigram_logprob": TEXT_BIGRAM_SQL,
    "train_bpe": TRAIN_BPE_SQL,
    "bpe_tokenize": BPE_TOKENIZE_SQL,
    # r15: the learned scorer — the oracle replays the whole GD loop
    # (chained 1-row coefficient CTEs, 6dp-rounded iterates)
    "text_quality_model": TEXT_QUALITY_MODEL_SQL,
}

LOCAL_SQL = {}
