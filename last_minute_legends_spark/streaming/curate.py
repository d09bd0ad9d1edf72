"""Streaming corpus curation: documents arrive as a JSON stream and
every STATELESS curation gate (language, quality, repetition, PII,
eval-set decontamination) is applied in-flight before documents land
in the curated sink.

The reference has no streaming text path (its streaming service is
events-only, /root/reference/services/spark_streaming_processor.py);
this extends the same file-source-as-Kafka pattern
(streaming/pipeline.py) to the ingest side of a pretraining corpus:
documents are curated as they arrive, so the batch curation job over
the landed corpus only has the corpus-LEVEL passes left (dedup
keeper election — inherently cross-document state, deliberately NOT
done in-stream; see curated_training_set for the batch composition).

Decontamination in-stream follows the literal-model pattern
(operators/similarity.py assign_buckets): the eval set's shingle
vocabulary is bounded model-side data, inlined as an array literal
so the check is a narrow ``arrays_overlap`` — no stream-static join
state, no shuffle. On a cluster with a large eval suite, register
the same set as a broadcast variable behind a pandas UDF; the plan
shape is unchanged.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.text import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    count_matches,
    word_shingles,
)
from last_minute_legends_spark.operators.curation import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    SSN_RE,
    _ngrams,
)
from last_minute_legends_spark.functions.text import words
from last_minute_legends_spark.sources.tables import load_table

DOC_WIRE_SCHEMA = ("doc_id long, text string, lang string, source string, "
                   "n_chars long")

RESULT_SCHEMA = "doc_id long, quality_score double"


def docs_as_json(docs: DataFrame) -> DataFrame:
    """documents table → one-column (value: string) Kafka-value-shaped
    JSON frame."""
    return docs.select(
        F.to_json(
            F.struct("doc_id", "text", "lang", "source", "n_chars")
        ).alias("value")
    )


def parse_doc_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    parsed = raw.withColumn("doc", F.from_json(F.col(value_col), DOC_WIRE_SCHEMA))
    return parsed.select("doc.*")


def curation_gate(eval_shingles: list[str], ngram_n: int = 8):
    """(keep: Column, score: Column) — every stateless curation gate
    as pure column expressions over ``text`` (usable on batch and
    streaming frames alike): English, quality >= 0.5, not
    repetitive, PII-free, and no word-n-gram overlap with the
    literal eval shingle set."""
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

    w = words(F.col("text"))
    wn = F.size(w)
    top_cnt = F.array_max(
        F.transform(F.array_distinct(w),
                    lambda x: F.size(F.filter(w, lambda y: y == x)))
    )
    g2, d2 = F.size(_ngrams(w, 2)), F.size(F.array_distinct(_ngrams(w, 2)))
    repetitive = (
        (top_cnt / F.greatest(wn, F.lit(1)) > 0.20)
        | ((g2 - d2) / F.greatest(g2, F.lit(1)) > 0.40)
    )

    pii = sum(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(p), 0))
        for p in (EMAIL_RE, SSN_RE, IPV4_RE, PHONE_RE)
    )
    if eval_shingles:
        contaminated = F.arrays_overlap(
            word_shingles(F.col("text"), ngram_n), F.lit(eval_shingles)
        )
    else:
        contaminated = F.lit(False)
    keep = (is_en & (F.round(score, 4) >= 0.5) & ~repetitive
            & (pii == 0) & ~contaminated)
    return keep, F.round(score, 4)


def run_curation_stream(spark: SparkSession, sf_dir: str,
                        ngram_n: int = 8) -> DataFrame:
    """Stage the documents table as a JSON stream, curate in-flight,
    land keepers in a parquet sink, and return the sink contents.

    The whole streaming plan is stateless (narrow maps + filter):
    no watermark, no state store — every micro-batch emits its
    keepers immediately, and the sink append is idempotent per file.
    """
    staging = tempfile.mkdtemp(prefix="llm_spark_curate_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    docs_as_json(docs).write.mode("overwrite").text(f"{staging}/in")

    # eval-set shingle vocabulary = bounded model-side data
    eval_shingles = sorted(
        r.s
        for r in docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.explode(word_shingles(F.col("text"), ngram_n)).alias("s"))
        .distinct()
        .collect()
    )

    stream = parse_doc_json(
        spark.readStream.option("maxFilesPerTrigger", "1").text(f"{staging}/in")
    ).filter(F.col("doc_id") % 7 != 0)   # eval docs never enter training
    keep, score = curation_gate(eval_shingles, ngram_n)
    kept = stream.filter(keep).select("doc_id", score.alias("quality_score"))

    q = (
        kept.writeStream.format("parquet")
        .option("path", f"{staging}/out")
        .option("checkpointLocation", f"{staging}/ckpt")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.schema(RESULT_SCHEMA).parquet(f"{staging}/out")
