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

import pandas as pd
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
    pii_free_col,
    repetition_fracs,
)
from last_minute_legends_spark.functions.text import words
from last_minute_legends_spark.sources.tables import load_table

DOC_WIRE_SCHEMA = ("doc_id long, text string, lang string, source string, "
                   "n_chars long")

# Above this, the decontamination set rides a broadcast variable +
# Arrow UDF instead of a plan literal (see curation_gate).
_LITERAL_SHINGLE_MAX = 512

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

    top_frac, dup2 = repetition_fracs(words(F.col("text")))
    repetitive = (top_frac > 0.20) | (dup2 > 0.40)
    if not eval_shingles:
        contaminated = F.lit(False)
    elif len(eval_shingles) <= _LITERAL_SHINGLE_MAX:
        contaminated = F.arrays_overlap(
            word_shingles(F.col("text"), ngram_n), F.lit(eval_shingles)
        )
    else:
        # Large eval suite: a literal array would (a) re-compile a
        # huge constant into every micro-batch's plan and (b) make
        # arrays_overlap probe the BIG set per row (it hashes the
        # smaller side). A broadcast frozenset behind an
        # Arrow-batched UDF probes O(|doc shingles|) per row instead
        # — the "register as a broadcast variable" scale path.
        spark = SparkSession.getActiveSession()
        bc = spark.sparkContext.broadcast(frozenset(eval_shingles))

        @F.pandas_udf("boolean")
        def _contam(sh: pd.Series) -> pd.Series:
            ev = bc.value
            return sh.map(lambda arr: any(x in ev for x in arr))

        contaminated = _contam(word_shingles(F.col("text"), ngram_n))
    keep = (is_en & (F.round(score, 4) >= 0.5) & ~repetitive
            & pii_free_col(F.col("text")) & ~contaminated)
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
    # stage as 32 files, 8 per trigger: 4 micro-batches (incremental
    # arrival is really exercised) and each batch's gate runs 8-way
    # parallel (one task per file — a micro-batch's partition count
    # IS its file count, so file granularity is the streaming
    # equivalent of the batch side's CPU-spread scan)
    docs_as_json(docs).repartition(32).write.mode("overwrite").text(f"{staging}/in")

    # eval-set shingle vocabulary = bounded model-side data
    eval_shingles = sorted(
        r.s
        for r in docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.explode(word_shingles(F.col("text"), ngram_n)).alias("s"))
        .distinct()
        .collect()
    )

    stream = parse_doc_json(
        spark.readStream.option("maxFilesPerTrigger", "8").text(f"{staging}/in")
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
