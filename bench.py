#!/usr/bin/env python
"""Headline-query benchmark.

Runs representative SURVEY §2 queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect overhead). One warmup query amortizes JVM/codegen
startup out of the measurement. Each cell is the MIN of 2 runs — a
single GC pause on the shared local JVM fabricated 6x phantom
"regressions" in earlier rounds; min-of-2 bounds that noise. The
timed window includes plan construction (some entries, e.g. the
connected-components fixpoint, do their real work there). Caches a
query persists internally are cleared after its runs so cross-query
cache accumulation can't OOM the suite (it did in r4).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_margin",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity",
    "q19_or_predicate",
    "q18_large_volume_customer",
    "topn_per_group",
    "cube_agg",
    "events_by_type",
    "events_windowed",
    "sessionization",
    "funnel",
    "user_segmentation",
    "asof_join",
    "range_join",
    "events_quantiles",
    "moving_avg",
    "events_sketches",
    "rollup_timeseries",
    "latest_by_user",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_clusters",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_tfidf_topterms",
    "text_vocab_topk",
    "training_set",
    "train_val_split",
    "multimodal_features",
    "multimodal_framesample",
    "catalog_text_etl",
    "stream_json_parse",
    "events_typed_parse",
    "events_avro_roundtrip",
    "sql_surface",
    # round-6 corpus-curation + packing + quantized-ANN entries
    "text_pii_redact",
    "text_repetition",
    "dedup_paragraph",
    "decontaminate",
    "curated_training_set",
    "pack_shards",
    "ann_quantized_topk",
    "multimodal_resize",
    "simulate_events",
    "mixture_sample",
    "corpus_stats",
    "text_unigram_logprob",
    # round-8: previously unbenched registry entries
    "skew_join",
    "train_bpe",
    "bpe_tokenize",
    # round-8 cont.: the last uncovered registry entries — every
    # queries() key now has a bench cell (streaming section aside),
    # so no regression anywhere is invisible
    "q4_order_priority",
    "q10_returned_items",
    "q14_promo_effect",
    "q22_idle_customers",
    "user_pivot",
    "json_props",
    "new_records",
    "price_extraction",
    "text_langid",
    "multimodal_meta",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from last_minute_legends_spark.session import get_spark
    from last_minute_legends_spark.plans.queries import QUERIES

    spark = get_spark("llm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            # drop frames the query persisted (shingle/signature
            # diamonds) so they can't accumulate across the suite
            spark.catalog.clearCache()
        return min(times)

    # warmup: JVM + codegen + parquet footer caches, and the Python
    # daemon worker fleet (first mapInPandas otherwise pays startup)
    QUERIES["q6_forecast_revenue"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long")
     .write.mode("overwrite").format("noop").save())

    # Machine load per cell: BENCH_r07 was contaminated by a contended
    # box (uniform 2-8x inflation across unrelated queries). Recording
    # the 1-min load average next to each timing makes a polluted run
    # self-evident instead of masquerading as a plan regression.
    timings: dict[str, float] = {}
    loadavg: dict[str, float] = {"suite_start": round(os.getloadavg()[0], 2)}
    for name in HEADLINE:
        loadavg[name] = round(os.getloadavg()[0], 2)
        try:
            timings[name] = round(run(name), 3)
        except Exception as exc:  # never lose the whole bench to one query
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    # streaming runs timed separately (real multi-batch executions —
    # kept OUT of the headline total so batch regressions stay visible)
    streaming: dict[str, float] = {}
    for name in ("stream_pipeline", "stream_enrich", "stream_sessionize",
                 "stream_dedup", "stream_curate", "simulate_stream"):
        try:
            loadavg[name] = round(os.getloadavg()[0], 2)
            t0 = time.perf_counter()
            n = QUERIES[name](spark, SF_DIR).count()
            streaming[name] = round(time.perf_counter() - t0, 3)
            streaming[f"{name}_rows"] = n
        except Exception as exc:
            streaming[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    loadavg["suite_end"] = round(os.getloadavg()[0], 2)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "headline_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "streaming": streaming,
        "loadavg_1m": loadavg,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
