#!/usr/bin/env python
"""1x / 3x / 10x scaling measurement for the LLM-pipeline operators.

VERDICT r8 asked for the scale story to be *measured*, not asserted:
the PPJoin/banding design claims candidate generation grows ~linearly
in corpus size when near-dup density per document is held constant.
The shipped testdata tops out at sf0.1 (5k docs / 2k vectors), so this
tool generates deterministic scaled corpora and re-times the dedup
tiers, IVF/quantized ANN, and the curation flagship at 1x, 3x and 10x
of that size, then fits the scaling exponent
``log(T_10x / T_1x) / log(10)`` per cell.

Corpus design (why not just replicate sf0.1 10x):

- Replicating the shipped documents verbatim would create exact-dup
  clusters of size 10 and quadratic-width shingle groups — a changed
  workload, not a scaled one. The shipped documents also draw from a
  ~40-word vocabulary, so the number of RANDOM pairs above the 0.8
  Jaccard threshold grows ~quadratically with corpus size: at that
  distribution even a perfect algorithm has quadratic OUTPUT. A 100 TB
  web corpus is the opposite regime (Heaps-law vocabulary growth,
  near-constant per-doc dup rate), which is the regime the linearity
  claim is about.
- Generated docs therefore draw 30-70 words per doc from a 20k-token
  vocabulary (plus a 20% mix of 40 common stopwords, so the prefix
  filter still sees frequent shingles it must refuse to index), and
  every 20th doc is a planted one-word-mutated copy of its predecessor
  (3-gram Jaccard ~0.88, above the 0.8 threshold) — fixed near-dup
  density, linear true-pair count, collision structure dominated by
  the planted pairs exactly as at production scale.
- Embeddings are deterministic pseudo-uniform [-1,1]^64 vectors
  (cosines concentrate near 0) with a +0.1-perturbed copy planted
  every 50th vector — same operating point as dedup_embedding.

Everything is a pure hash/arithmetic function of the row id (the
sources/simulator.py discipline): no RNG state, no driver loop,
identical data at any partitioning.

The timed cells are the REGISTRY callables (plans/queries.py) pointed
at the generated directory — the exact code the driver benches, not
reimplementations. min-of-2 with cache clearing between runs, noop
sink, same harness shape as bench.py.

Interpretation note recorded with the results: at these absolute sizes
(sub-second to ~10 s cells) each cell carries ~0.2-0.5 s of fixed
job-scheduling overhead, which DEFLATES exponents for fast cells; the
honest read is "exponent <= ~1.1 and absolute times small", not the
raw exponent alone.

Cells run ONE PER PROCESS by default (tools/run_scale_bench.sh loops
over them): a shared long-lived JVM accumulates old-gen pressure that
inflated later cells up to 3x in whole-suite runs (jaccard x10 59.6 s
mid-suite vs 19.5 s in a fresh JVM — measured, not hypothesized), and
a per-cell fresh JVM plus a per-cell warmup run at the smallest mult
(whole-stage codegen compiles per plan SHAPE, then caches across
input paths) isolates each exponent from both effects. Results MERGE
into scale_local.json so the per-cell invocations compose.

Usage:  python tools/scale_bench.py [--mults 1 3 10] [--cells ...]
                                    [--vocab-beta 0.5]
        tools/run_scale_bench.sh       # one fresh JVM per cell

``--vocab-beta 0.5`` generates Heaps-law-scaled vocabularies
(vocab ∝ n^0.5 — the documented 100-TB web-corpus operating point)
instead of the fixed 20k vocab; results are recorded under
``<cell>@vb0.5`` keys. The fixed-vocab corpora measure the
saturated-diversity stress regime, where per-shingle document
frequency grows ∝ n and random shared-shingle candidates therefore
grow ~quadratically BY CONSTRUCTION (output stays linear); the
Heaps corpora measure the claimed-linear production regime.
Writes/merges scale_local.json at the repo root and prints a table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DOCS = 5_000      # sf0.1's documents row count
BASE_VECS = 2_000      # sf0.1's embeddings row count
BASE_EVENTS = 100_000  # sf0.1's events row count
BASE_USERS = 1_500     # sf0.1's distinct user_id count
DIM = 64
VOCAB = 20_000
STOPWORDS = (
    "the of and to in is was for on with as by at from it that this "
    "be are were has had not but or an if then else when where who "
    "what which how all any each"
).split()  # 40 common tokens -> frequent shingles the prefix filter must skip

CELLS = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    # r17b: SemDeDup at the production geometry (adaptive k, bounded
    # training sample) + its frozen-geometry fixed-epoch absorb (index
    # cached per corpus — the flat-ladder lifecycle claim)
    "dedup_semantic_scaled",
    "dedup_semantic_delta_fixed",
    "dedup_clusters",
    "dedup_substring",        # r11: Lee-et-al span dedup
    "dedup_substring_clean",  # r11: its keep-first repair pass
    # r15: incremental dedup, production xxhash64 form. _fixed holds
    # the epoch at 200 docs while the indexed corpus scales — the
    # lifecycle claim ("absorbing an epoch costs the epoch, not the
    # corpus") read directly off the exponent; _prop scales the epoch
    # with the corpus (20%) as the worst case. Index build is cached
    # per corpus fingerprint, so min-of-2 converges on absorb-only
    # cost (the ann_ivf_probe_indexed economics).
    "dedup_delta_fixed",
    "dedup_delta_prop",
    # r17: the cluster-label fold measured end-to-end INCLUDING the
    # touched-bucket rewrite I/O (VERDICT r16 #1/#2); the streaming
    # twin (stream_clusters_delta_xx) is under the streaming section
    "dedup_clusters_delta_fixed",
    "dedup_clusters_delta_prop",
    "dedup_phash",        # r15: Arrow-pass aHash + hamming band join
    "zorder_documents",   # r15: Morton rewrite + 2-D scoped dedup read
    "ann_ivf_topk",
    "ann_ivf_probe_indexed",  # r12: flat probe — index built once/corpus
    "ann_ivf_append_probe",  # r13: probe after frozen-centroid ingest —
    # build+append cached per corpus, converges on probe-only cost
    "ann_quantized_topk",
    "ann_pq_topk",  # r17: PQ codebook train + encode + ADC + re-rank
    "ann_ivfpq_topk",  # r17b: coarse probes restrict the ADC scan
    # r18 (VERDICT r17 #5): the written-layout probe — index built
    # once per corpus fingerprint, so min-of-2 converges on
    # probe-only cost; the probe should ladder FLAT while the topk
    # form (which re-encodes per invocation) scales with the corpus
    "ann_ivfpq_probe_indexed",
    "ann_ivfpq_residual_topk",  # r17b: FAISS-proper residual IVFADC
    "curated_training_set",
    # event-analytics cells (scaled events: user count grows with the
    # corpus, per-user event density constant — the production regime)
    "sessionization",
    "rollup_timeseries",
    "events_quantiles",
    "latest_by_user",
    "funnel",
    "json_props",
    "moving_avg",
    "user_segmentation",
    "events_by_type",
    "user_pivot",
    "events_windowed",
    # r12: day-partitioned recency rollup — the generated events' time
    # RANGE grows with mult (per-day volume constant), so the pruned
    # 2-day read is FLAT once the span passes 2 days (~x22); below
    # that the whole corpus is inside the range and cost tracks it
    "events_partition_pruned",
    "cohort_retention",  # r12: retention matrix over scaled events
    "skew_join",  # r14: salted events x customer join — dim copied
    # fixed-size into the corpus (the stream_enrich pattern); matched
    # fraction shrinks past x10 (15k custkeys vs 1500*m users), so the
    # exponent reads the shuffle/probe cost story, not output growth.
    # The Zipf twin (@zipf) is the hot-key regime measurement.
    "bloom_semi_join",  # r14: runtime Bloom semi-join reduction — the
    # nation-3 dim matches ~40% of events at x1 and ~1.3% at x30, so
    # the cell measures exactly what the filter is for: fact rows
    # killed below the exchange, cost converging on the scan
    # r10: text / curation / BPE / multimodal family — every
    # documents-reading registry entry gets a measured exponent
    # (skew_join and catalog_text_etl are excluded: they read the
    # TPC-H tables the generator does not scale)
    "text_langid",
    "text_quality",
    "text_tfidf_topterms",
    "text_vocab_topk",
    "corpus_stats",
    "text_unigram_logprob",
    "text_bigram_logprob",        # r17: order-2 LM, adaptive join
    "text_bigram_logprob_bcast",  # forced broadcast regime —
    "text_bigram_logprob_shuf",   # the measured join crossover
    "train_bpe",
    "bpe_tokenize",
    "text_quality_model",  # r15: GD fit = 8 fixed aggregate jobs over
    # the signal frame (cost ∝ corpus, iteration count fixed) + one
    # narrow scoring pass
    "text_pii_redact",
    "text_repetition",
    "dedup_paragraph",
    "pack_shards",
    "mixture_sample",
    "global_shuffle",  # r17b: seeded epoch shuffle (one exchange)
    "decontaminate",
    "decontaminate_fuzzy",  # r13: asymmetric broadcast LSH — the %7 eval
    # (r14: this key now means the PRODUCTION xxhash64 form; the
    # pre-split md5 minima in scale_local.json are upper bounds the
    # faster production re-runs overwrite via the minima merge)
    "decontaminate_fuzzy_replay",  # r14: md5 oracle twin, own lineage
    # split scales with the corpus here (worst case for the broadcast);
    # a production eval suite is fixed-size, so the measured exponent is
    # an upper bound on the real deployment's
    "training_set",
    "train_val_split",
    "multimodal_features",
    "multimodal_framesample",
    "multimodal_resize",
    # r10: streaming axis — the Structured Streaming drivers run
    # end-to-end (stage topic JSON -> file stream -> watermarked
    # stateful op -> sink -> read-back) against the scaled events/
    # documents, so the exponent covers staging + parse + state +
    # emission, exactly what bench.py times. stream_enrich's
    # customer/nation dims are copied fixed-size from sf0.1 into the
    # generated corpus (a 100-TB deployment scales the fact stream,
    # not the dims — the dim side stays a broadcast at any mult).
    # simulate_stream is excluded: its generator is bounded to a
    # fixed 2000 events regardless of sf_dir.
    "stream_pipeline",
    "stream_sessionize",
    "stream_enrich",
    "stream_dedup",
    "stream_curate",
    # r13: watermarked stream-stream join (state ∝ rate x horizon),
    # day-partitioned streaming landing (foreachBatch dynamic
    # overwrite), and the CDC merge (private layout build + last-3-day
    # merge — the BUILD dominates and scales with the corpus; the
    # merge itself touches only the partitions the change-set names)
    "stream_stream_join",
    "stream_join_mb",        # r15: 6-batch watermark-ordered delivery —
    "stream_outer_join_mb",  # the bounded-state production regime; the
    # only forms that also ladder under --zipf (hot-key state stays
    # per-batch instead of corpus-scale)
    "stream_outer_join",  # r14: left-outer form — same state bound, plus
    # eviction-time null emission for never-converted views
    "stream_clusters_delta_xx",  # r17: streaming absorb + bucket-store
    # label fold, production hashes (VERDICT r16 #7)
    "stream_phash_delta",      # r17: streaming image-dedup lifecycle
    "stream_embedding_delta",  # r17: streaming embedding-dedup
    # lifecycle (frozen-plane absorbs; base build cached per corpus)
    "stream_partitioned_landing",
    "cdc_merge_upsert",
    "compact_small_files",
    "zorder_events",
    "incremental_rollup",
    "incremental_distinct",  # r13: HLL-register MV maintenance — per-epoch
    # cost ∝ epoch size, state ∝ days × m
    "incremental_quantile",  # r13: two-sweep histogram-bin maintenance —
    # edges from folded exact stats, then bin folds against frozen edges
    # events wire-format cells (events-only readers; new_records /
    # price_extraction / skew_join / catalog_text_etl /
    # events_typed_parse stay excluded — they read the TPC-H tables
    # the generator does not scale)
    "events_sketches",
    "events_hll_replay",  # r13: portable-HLL twin — same two-shuffle
    # register shape as the native sketch, md5 instead of xxhash64
    "events_hist_quantile",  # r13: portable histogram-quantile twin —
    # two partial-aggregatable passes, 64-bin state per group
    "stream_json_parse",
    "events_avro_roundtrip",
    "events_csv_roundtrip",
    "events_orc_roundtrip",
    # r12: the core-OLAP family ladders too — gen_tpch scales the
    # whole star schema together (customers/suppliers/parts/orders/
    # lineitem ∝ mult, fixed region/nation catalogs) on separate
    # x{m}tpch corpora, closing the "OLAP cells excluded" caveat.
    # (skew_join / catalog_text_etl / events_typed_parse still mix
    # events with TPC-H tables across corpus families and stay out.)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_margin",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q19_or_predicate",
    "topn_per_group",
    "cube_agg",
    "q16_supplier_count",
    "q22_idle_customers",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity",
]


def gen_documents(spark, n_docs: int, out_path: str,
                  vocab: int = VOCAB) -> None:
    from pyspark.sql import functions as F

    ids = spark.range(n_docs)
    is_copy = F.col("id") % 20 == 1
    base = F.when(is_copy, F.col("id") - 1).otherwise(F.col("id"))

    def h(k, *cols):
        return F.xxhash64(*cols, F.lit(k))

    n_words = (F.pmod(h(0, base), F.lit(41)) + 30).cast("int")
    # the one mutated position of a planted copy (interior, so three
    # 3-gram shingles change): 5..24 < min doc length 30
    mut_pos = (F.pmod(h(1, F.col("id")), F.lit(20)) + 5).cast("int")

    def word(pos):
        stop = F.element_at(
            F.array(*[F.lit(s) for s in STOPWORDS]),
            (F.pmod(h(2, base, pos), F.lit(len(STOPWORDS))) + 1).cast("int"),
        )
        rare = F.concat(F.lit("tok"),
                        F.pmod(h(3, base, pos), F.lit(vocab)).cast("string"))
        picked = F.when(F.pmod(h(4, base, pos), F.lit(5)) == 0, stop).otherwise(rare)
        return F.when(is_copy & (pos == mut_pos),
                      F.concat(F.lit("mut"), F.col("id").cast("string"))
                      ).otherwise(picked)

    words = F.transform(F.sequence(F.lit(0), n_words - 1), word)
    text = F.array_join(words, " ")
    docs = ids.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zh")),
                     (F.pmod(h(5, F.col("id")), F.lit(4)) + 1).cast("int")
                     ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(h(6, F.col("id")), F.lit(5)).cast("string")
                 ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(out_path)


def gen_embeddings(spark, n_vecs: int, out_path: str) -> None:
    from pyspark.sql import functions as F

    ids = spark.range(n_vecs)
    is_copy = F.col("id") % 50 == 1
    base = F.when(is_copy, F.col("id") - 1).otherwise(F.col("id"))
    comp = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (F.pmod(F.xxhash64(base, j, F.lit(7)), F.lit(2001))
                   / F.lit(1000.0) - 1).cast("float"),
    )
    vec = F.when(
        is_copy,
        F.concat(F.array((F.element_at(comp, 1) + F.lit(0.1)).cast("float")),
                 F.expr("slice(__c, 2, {})".format(DIM - 1))),
    ).otherwise(F.col("__c"))
    emb = ids.withColumn("__c", comp).select(
        F.col("id").alias("vec_id"),
        vec.cast("array<float>").alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit(8)), F.lit(10)).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(out_path)


def gen_events(spark, n_events: int, n_users: int, out_path: str,
               zipf: bool = False) -> None:
    """sf0.1-shaped events at any size: ids are the clock (~0.4-0.8 s
    hash-jittered gaps, so the time range grows with the corpus while
    per-user density stays constant — user count scales with mult).

    ``zipf=True`` swaps the uniform user draw for a rank-frequency
    Zipf(s=1) one via the closed-form inverse CDF ``rank =
    ⌊N^u⌋`` (u uniform on [0,1): P(rank ≤ r) = ln r / ln N, so
    frequency ∝ 1/rank) — the skewed-key regime the salted join /
    AQE skew handling exists for. The head is BRUTAL by design:
    user 0 owns ln2/lnN of ALL events (≈9.5% at x1, still ≈6.4%
    at x30 — an absolute hot-key row count that grows linearly with
    the corpus), which is exactly what a uniform ladder never
    exercises."""
    from pyspark.sql import functions as F

    ids = spark.range(n_events)

    def h(k):
        return F.xxhash64(F.col("id"), F.lit(9), F.lit(k))

    start_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    ts_us = (F.lit(start_us) + F.col("id") * F.lit(400_000)
             + F.pmod(h(1), F.lit(400_000)))
    if zipf:
        u = (F.pmod(h(2), F.lit(1 << 20)) + F.lit(0.5)) / F.lit(1 << 20)
        user = (F.floor(F.pow(F.lit(float(n_users)), u)) - 1).cast("long")
    else:
        user = F.pmod(h(2), F.lit(n_users))
    ev = ids.select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(ts_us).alias("ts"),
        user.alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")]),
            (F.pmod(h(3), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(h(4), F.lit(20_000)) / F.lit(100.0)).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(h(5), F.lit(100)).cast("string"),
                 F.lit("}")).alias("props"),
    )
    ev.write.mode("overwrite").parquet(out_path)


# sf0.1 row counts of the TPC-H-shaped tables (the OLAP ladder's x1)
BASE_ORDERS = 150_000
BASE_CUST = 15_000
BASE_SUPP = 1_000
BASE_PART = 20_000

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_STATUSES = ("O", "F", "P")
_PTYPES = ("ECONOMY", "SMALL", "LARGE", "STANDARD", "MEDIUM", "PROMO")
_PADJ = ("blue", "old", "large", "hot", "cold", "red", "small", "new")
_PNOUN = ("widget", "ring", "gear", "gizmo", "bolt", "plate", "rod", "anvil")
_EPOCH_1995 = 788_918_400_000_000  # 1995-01-01 UTC in micros
_DAY_US_ = 86_400_000_000


def _pick(col, values):
    from pyspark.sql import functions as F

    return F.element_at(F.array(*[F.lit(v) for v in values]),
                        (F.pmod(col, F.lit(len(values))) + 1).cast("int"))


def gen_tpch(spark, mult: int, out_dir: str) -> None:
    """sf0.1-shaped TPC-H-ish star schema at any size — same value
    ranges, formats, and predicate literals as the shipped testdata
    (dates 1995..2001, Brand#0-24, the 8x8 part-name vocabulary incl.
    'widget', the five mktsegments/priorities), so every plans/olap.py
    filter selects a comparable fraction at every mult. Closed-form
    hash fields (the gen_events pattern): no RNG, no driver loops,
    deterministic at any size. Fact keys range over the SCALED
    dimension keys, so join fan-outs hold shape as everything grows
    together (the TPC-H scaling model). region/nation stay the fixed
    25/5 catalogs, copied by ensure_corpus."""
    from pyspark.sql import functions as F

    def h(k, col):
        return F.xxhash64(col, F.lit(77), F.lit(k))

    n_cust, n_supp = BASE_CUST * mult, BASE_SUPP * mult
    n_part, n_orders = BASE_PART * mult, BASE_ORDERS * mult

    ids = spark.range(n_cust)
    (ids.select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"),
                 F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
        F.pmod(h(1, F.col("id")), F.lit(25)).cast("int").alias("c_nationkey"),
        (F.pmod(h(2, F.col("id")), F.lit(1_000_000)) / 100.0).alias("c_acctbal"),
        _pick(h(3, F.col("id")), _SEGMENTS).alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "customer.parquet")))

    ids = spark.range(n_supp)
    (ids.select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"),
                 F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
        F.pmod(h(4, F.col("id")), F.lit(25)).cast("int").alias("s_nationkey"),
        (F.pmod(h(5, F.col("id")), F.lit(1_000_000)) / 100.0).alias("s_acctbal"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "supplier.parquet")))

    ids = spark.range(n_part)
    (ids.select(
        F.col("id").alias("p_partkey"),
        F.concat(_pick(h(6, F.col("id")), _PADJ), F.lit(" "),
                 _pick(h(7, F.col("id")), _PNOUN)).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 F.pmod(h(8, F.col("id")), F.lit(25)).cast("string")).alias("p_brand"),
        _pick(h(9, F.col("id")), _PTYPES).alias("p_type"),
        (F.pmod(h(10, F.col("id")), F.lit(50)) + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + F.pmod(h(11, F.col("id")), F.lit(1000)) / 10.0)
        .alias("p_retailprice"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "part.parquet")))

    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(h(12, F.col("id")), F.lit(n_cust)).alias("o_custkey"),
        _pick(h(13, F.col("id")), _STATUSES).alias("o_orderstatus"),
        (F.pmod(h(14, F.col("id")), F.lit(40_000_000)) / 100.0 + 900.0)
        .alias("o_totalprice"),
        F.timestamp_micros(
            F.lit(_EPOCH_1995)
            + F.pmod(h(15, F.col("id")), F.lit(2404)) * F.lit(_DAY_US_)
        ).alias("o_orderdate"),
        _pick(h(16, F.col("id")), _PRIORITIES).alias("o_orderpriority"),
    )
    orders.write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet"))

    # lineitem rides the orders frame: 1-7 lines per order (avg 4,
    # the sf0.1 shape) via explode of a hash-sized sequence (explode) — one
    # narrow pass, no join back
    li_src = orders.select(
        "o_orderkey", "o_orderdate",
        F.sequence(F.lit(1), (F.pmod(h(17, F.col("o_orderkey")), F.lit(7)) + 1)
                   .cast("int")).alias("_lines"))
    lk = F.col("o_orderkey") * 8 + F.col("l_linenumber")  # unique per line
    (li_src.select("o_orderkey", "o_orderdate",
                   F.explode("_lines").alias("l_linenumber"))
     .select(
         F.col("o_orderkey").alias("l_orderkey"),
         F.pmod(h(18, lk), F.lit(n_part)).alias("l_partkey"),
         F.pmod(h(19, lk), F.lit(n_supp)).alias("l_suppkey"),
         F.col("l_linenumber").cast("int"),
         (F.pmod(h(20, lk), F.lit(50)) + 1).cast("double").alias("l_quantity"),
         (F.lit(900.0) + F.pmod(h(21, lk), F.lit(10_410_000)) / 100.0)
         .alias("l_extendedprice"),
         (F.pmod(h(22, lk), F.lit(11)) / 100.0).alias("l_discount"),
         (F.pmod(h(23, lk), F.lit(9)) / 100.0).alias("l_tax"),
         _pick(h(24, lk), ("N", "A", "R")).alias("l_returnflag"),
         _pick(h(25, lk), ("O", "F")).alias("l_linestatus"),
         F.timestamp_micros(
             F.unix_micros(F.col("o_orderdate"))
             + (F.pmod(h(26, lk), F.lit(95)) + 1) * F.lit(_DAY_US_)
         ).alias("l_shipdate"),
     )
     .write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet")))


# cells that read ONLY the TPC-H star schema — they ladder on the
# x{m}tpch corpora (scaled customer/supplier/part/orders/lineitem +
# fixed region/nation). Kept OUT of the shared doc/event corpora so
# stream_enrich's fixed-dim broadcast history stays comparable.
# (skew_join / catalog_text_etl / events_typed_parse mix events with
# TPC-H tables and stay unladdered.)
TPCH_CELLS = {
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q9_product_margin", "q13_customer_distribution",
    "q18_large_volume_customer", "q19_or_predicate", "topn_per_group",
    "cube_agg", "q16_supplier_count", "q22_idle_customers",
    "q4_order_priority", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q10_returned_items", "q14_promo_effect",
    "q15_top_supplier", "q17_small_quantity",
}


FIXED_DELTA_DOCS = 200


def _dedup_delta_cell(fixed: bool):
    """Ladder-only callables for the incremental-dedup lifecycle
    (production xxhash64 hashes — the md5 registry form is the oracle
    apparatus, not the hot path). ``fixed`` holds the absorbed epoch
    at FIXED_DELTA_DOCS documents at every mult; otherwise the epoch
    is a fifth of the corpus, the registry entry's shape. The base
    index is built once per corpus fingerprint (layout_cache), so the
    min-of-2 cell converges on absorb-only cost."""
    from pyspark.sql import functions as F

    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_delta, write_band_index,
    )
    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.tables import Catalog

    def cell(spark, sf_dir):
        docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        if fixed:
            split = F.col("doc_id") < FIXED_DELTA_DOCS
            tag = f"fix{FIXED_DELTA_DOCS}"
        else:
            split = F.col("doc_id") % 5 == 0
            tag = "mod5"
        base, delta = docs.filter(~split), docs.filter(split)
        idx = layout_cache.layout_dir(
            "dedup_band_index_ladder",
            os.path.join(sf_dir, "documents.parquet"), f"v1-xx-{tag}")
        layout_cache.build_once(
            idx, lambda tmp: write_band_index(base, tmp, 0.8))
        return absorb_delta(spark, base, delta, idx, 0.8, append=False)

    return cell


def _mb_join_cell(outer: bool):
    """Multi-batch stream-stream join cells (r15, VERDICT r14 #3):
    watermark-ordered 6-group delivery keeps per-batch join state at
    rate × (bound + delay), which is what makes these two operators
    Zipf-ladderable at all — under one-batch staging a hot key's
    state-store probes grow quadratically in its full corpus share
    (the measured 28-min wedge, r14). Output identical to the
    one-batch registry entries (parity test-locked)."""
    def cell(spark, sf_dir):
        from last_minute_legends_spark.streaming.pipeline import (
            run_stream_join_pipeline, run_stream_outer_join_pipeline,
        )
        fn = (run_stream_outer_join_pipeline if outer
              else run_stream_join_pipeline)
        return fn(spark, sf_dir, n_batches=6)
    return cell


FIXED_DELTA_VECS = 200


def _emb_delta_cell(fixed: bool):
    """Ladder cells for the embedding-tier delta lifecycle (r16,
    VERDICT r15 #1): fixed-size epoch absorbed against a growing
    frozen-plane band index (the corpus-size-independence claim) or
    a proportional mod-5 epoch (the registry entry's shape). Uses the
    registry's planted corpus so the probe verifies real pairs; the
    base index is built once per corpus fingerprint."""
    from pyspark.sql import functions as F

    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_embedding_delta, write_embedding_index,
    )
    from last_minute_legends_spark.operators.similarity import (
        with_unit_vectors,
    )
    from last_minute_legends_spark.plans.dedup_q import _embedding_corpus
    from last_minute_legends_spark.sources import layout_cache

    def cell(spark, sf_dir):
        emb = with_unit_vectors(_embedding_corpus(spark, sf_dir)).persist()
        if fixed:
            split = F.col("id") < FIXED_DELTA_VECS
            tag = f"fix{FIXED_DELTA_VECS}"
        else:
            split = F.col("id") % 5 == 0
            tag = "mod5"
        base, delta = emb.filter(~split).persist(), emb.filter(split)
        idx = layout_cache.layout_dir(
            "emb_band_index_ladder",
            os.path.join(sf_dir, "embeddings.parquet"), f"v1-{tag}")
        layout_cache.build_once(
            idx, lambda tmp: write_embedding_index(base, tmp, 0.95))
        return absorb_embedding_delta(spark, base, delta, idx,
                                      append=False)

    return cell


def _clusters_delta_cell(fixed: bool):
    """Ladder cells for the INCREMENTAL CLUSTER-LABEL fold (r17,
    VERDICT r16 #1/#2: the fold's scale claim was test-locked but
    unmeasured). Per timed run: absorb the epoch against the cached
    band index (the dedup_delta cells' absorb), derive its NEW edges,
    then fold them into a private hardlink-clone of the cached
    bucket-partitioned labels store with ``write=True`` — so the
    measured cost INCLUDES the touched-bucket rewrite I/O the bucket
    layout exists to bound. ``fixed`` holds the epoch at
    FIXED_DELTA_DOCS docs while the corpus (and the labels store,
    auto-bucketed to corpus size) grows — the flat-ladder claim."""
    from pyspark.sql import functions as F

    from last_minute_legends_spark.operators.dedup import (
        connected_components,
    )
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_delta, stored_pairs, write_band_index,
    )
    from last_minute_legends_spark.operators.labels_store import (
        merge_labels_store, write_labels_store,
    )
    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.tables import Catalog

    def cell(spark, sf_dir):
        import atexit
        import shutil
        import tempfile

        docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
        if fixed:
            split = F.col("doc_id") < FIXED_DELTA_DOCS
            tag = f"fix{FIXED_DELTA_DOCS}"
        else:
            split = F.col("doc_id") % 5 == 0
            tag = "mod5"
        base, delta = docs.filter(~split), docs.filter(split)
        idx = layout_cache.layout_dir(
            "dedup_band_index_ladder",
            os.path.join(sf_dir, "documents.parquet"), f"v1-xx-{tag}")
        layout_cache.build_once(
            idx, lambda tmp: write_band_index(base, tmp, 0.8))
        lab = layout_cache.layout_dir(
            "dedup_labels_store_ladder",
            os.path.join(sf_dir, "documents.parquet"), f"v1-xx-{tag}")
        layout_cache.build_once(lab, lambda tmp: write_labels_store(
            connected_components(stored_pairs(spark, idx)), tmp))
        stored = stored_pairs(spark, idx)
        full = absorb_delta(spark, base, delta, idx, 0.8, append=False)
        # persist: the fold consumes the edge set three times (node
        # extraction + both endpoint lookups) — the registry entry's
        # reasoning; the runner's clearCache() releases it per run
        new_edges = full.join(stored.select("doc_a", "doc_b"),
                              ["doc_a", "doc_b"], "left_anti").persist()
        # private mutable clone (hardlinks — the streaming pipeline's
        # _clone_tree economics): the fold MUTATES its store
        priv = tempfile.mkdtemp(prefix="llm_lab_ladder_")
        atexit.register(shutil.rmtree, priv, ignore_errors=True)
        from last_minute_legends_spark.streaming.pipeline import (
            _clone_tree,
        )
        _clone_tree(lab, priv)
        return merge_labels_store(spark, priv, new_edges, write=True)

    return cell


def _bigram_cell(force: str):
    """Forced-regime bigram-LM cells (r17, VERDICT r16 #3): the same
    query with the scoring join pinned to broadcast or shuffle — the
    measured crossover BIGRAM_BROADCAST_MAX documents."""
    def cell(spark, sf_dir):
        from last_minute_legends_spark.plans.curation_q import (
            _bigram_logprob,
        )
        mx = (1 << 62) if force == "bcast" else 0
        return _bigram_logprob(spark, sf_dir, broadcast_max=mx)
    return cell


def _stream_clusters_cell(spark, sf_dir):
    """Streaming label-maintenance ladder (r17, VERDICT r16 #7): the
    full run_stream_dedup_delta lifecycle with maintain_labels=True on
    production xxhash64 hashes — per-epoch absorb + bucket-store fold,
    4 epochs. The cell's claim: per-epoch cost bounded by the epoch on
    the streaming path too."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_dedup_delta,
    )
    return run_stream_dedup_delta(spark, sf_dir, n_epochs=4,
                                  threshold=0.8, cache_tag="xx",
                                  maintain_labels=True)


def _stream_semantic_cell(spark, sf_dir):
    """Streaming SemDeDup ladder (r17b): the full
    run_stream_semantic_delta lifecycle — 3 id-ordered epochs over
    the top-20% delta absorbed against the cached bottom-80% frozen
    k-means index, health consulted at epoch boundaries. The cell's
    claim: per-epoch cost ∝ epoch x bounded-cluster-size on the
    streaming path too (epochs here are proportional — they grow
    with the corpus — so sublinear is the pass bar, flat is not
    expected)."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_semantic_delta,
    )
    return run_stream_semantic_delta(spark, sf_dir, n_epochs=4,
                                     cache_tag="ladder")


def _join_agg_cell(spark, sf_dir):
    """r16 (VERDICT r15 #3): the aggregate-push stream join under the
    same 6-batch watermark-ordered delivery as the pair-emitting
    forms — the cell whose Zipf row must stay sublinear where
    stream_join_mb goes superlinear on output cardinality."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_join_agg_pipeline,
    )
    return run_stream_join_agg_pipeline(spark, sf_dir, n_batches=6)


def _semantic_scaled_cell(spark, sf_dir):
    """Single-shot SemDeDup at the production geometry (r17b): the k ∝
    corpus / bounded-training-sample form over the planted corpus —
    this is the WRITE-ONCE index-build cost curve (the IVF-build
    analog; its amortized read path is the _delta_fixed cell)."""
    from last_minute_legends_spark.operators.similarity import (
        semantic_scaled_keep, with_unit_vectors,
    )
    from last_minute_legends_spark.plans.dedup_q import _embedding_corpus

    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir))
    return semantic_scaled_keep(emb, 0.7)


def _semantic_delta_fixed_cell(spark, sf_dir):
    """Fixed-epoch semantic absorb against a growing cached
    frozen-geometry index (r17b): the top FIXED_DELTA_VECS ids are the
    epoch (ingestion order is id order — the monotone-verdict
    contract), everything below is the indexed base. Per-epoch cost =
    narrow k-fold assign + bucket-pruned probe of touched clusters +
    epoch-sized verify — the flat-ladder claim."""
    from pyspark.sql import functions as F

    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_semantic_delta, write_semantic_index,
    )
    from last_minute_legends_spark.operators.similarity import (
        semantic_scaled_params, with_unit_vectors,
    )
    from last_minute_legends_spark.plans.dedup_q import _embedding_corpus
    from last_minute_legends_spark.sources import layout_cache

    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir)).persist()
    cut = int(emb.select("id").orderBy(F.desc("id"))
              .limit(FIXED_DELTA_VECS).agg(F.min("id")).first()[0])
    base = emb.filter(F.col("id") < cut)
    delta = emb.filter(F.col("id") >= cut)
    idx = layout_cache.layout_dir(
        "sem_index_ladder",
        os.path.join(sf_dir, "embeddings.parquet"),
        f"v2-fix{FIXED_DELTA_VECS}")

    def _build(tmp):
        n = base.count()
        k, mod = semantic_scaled_params(n)
        write_semantic_index(base, tmp, 0.7, k=k, iters=3,
                             sample_mod=mod, use_np=True)

    layout_cache.build_once(idx, _build)
    return absorb_semantic_delta(spark, emb, delta, idx, append=False)


SPECIAL_CELLS = {
    "dedup_delta_fixed": _dedup_delta_cell(fixed=True),
    "dedup_delta_prop": _dedup_delta_cell(fixed=False),
    "stream_join_mb": _mb_join_cell(outer=False),
    "stream_outer_join_mb": _mb_join_cell(outer=True),
    "stream_join_agg_mb": _join_agg_cell,
    "dedup_embedding_delta_fixed": _emb_delta_cell(fixed=True),
    "dedup_semantic_scaled": _semantic_scaled_cell,
    "dedup_semantic_delta_fixed": _semantic_delta_fixed_cell,
    "dedup_embedding_delta_prop": _emb_delta_cell(fixed=False),
    "dedup_clusters_delta_fixed": _clusters_delta_cell(fixed=True),
    "dedup_clusters_delta_prop": _clusters_delta_cell(fixed=False),
    "stream_clusters_delta_xx": _stream_clusters_cell,
    "stream_semantic_delta_st": _stream_semantic_cell,
    "text_bigram_logprob_bcast": _bigram_cell("bcast"),
    "text_bigram_logprob_shuf": _bigram_cell("shuf"),
}


def ensure_tpch(spark, mult: int, root: str) -> str:
    d = os.path.join(root, f"x{mult}tpch")
    marker = os.path.join(d, "_GENERATED_TPCH_v1")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        gen_tpch(spark, mult, d)
        with open(marker, "w") as f:
            f.write(json.dumps({"mult": mult,
                                "orders": BASE_ORDERS * mult,
                                "gen_sec": round(time.perf_counter() - t0, 2)}))
    import shutil as _shutil
    dim_src = os.environ.get("SPARK_GRAFT_DIM_SRC", "/root/testdata/sf0.1")
    for dim in ("region.parquet", "nation.parquet"):
        src, dst = os.path.join(dim_src, dim), os.path.join(d, dim)
        if not os.path.exists(dst) and os.path.exists(src):
            (_shutil.copytree if os.path.isdir(src) else _shutil.copy2)(src, dst)
    return d


def ensure_corpus(spark, mult: int, root: str,
                  vocab: int = VOCAB, zipf: bool = False) -> str:
    suffix = ("" if vocab == VOCAB else f"v{vocab}") + ("z" if zipf else "")
    d = os.path.join(root, f"x{mult}{suffix}")
    marker = os.path.join(d, "_GENERATED_v2")  # v2: + events.parquet
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        if not zipf:
            # zipf corpora serve the events-keyed skew cells only —
            # documents/embeddings would be byte-identical to the
            # uniform corpus's and are not regenerated
            gen_documents(spark, BASE_DOCS * mult,
                          os.path.join(d, "documents.parquet"), vocab=vocab)
            gen_embeddings(spark, BASE_VECS * mult,
                           os.path.join(d, "embeddings.parquet"))
        gen_events(spark, BASE_EVENTS * mult, BASE_USERS * mult,
                   os.path.join(d, "events.parquet"), zipf=zipf)
        with open(marker, "w") as f:
            f.write(json.dumps({"mult": mult, "vocab": vocab, "zipf": zipf,
                                "docs": BASE_DOCS * mult,
                                "vecs": BASE_VECS * mult,
                                "events": BASE_EVENTS * mult,
                                "gen_sec": round(time.perf_counter() - t0, 2)}))
    # Fixed-size dimension tables for the stream-static enrich join:
    # copied verbatim from the shipped sf0.1 testdata (read-only
    # source; override with SPARK_GRAFT_DIM_SRC) because a scaled
    # deployment scales the fact stream, not the dims. Generated
    # user_ids overlap the custkey range, so the broadcast join does
    # real probe work at every mult. A missing source is warned about
    # UP FRONT — otherwise the stream_enrich cell would die
    # mid-bench with a path-not-found that looks like a streaming
    # bug.
    import shutil as _shutil
    dim_src = os.environ.get("SPARK_GRAFT_DIM_SRC", "/root/testdata/sf0.1")
    for dim in ("customer.parquet", "nation.parquet"):
        src = os.path.join(dim_src, dim)
        dst = os.path.join(d, dim)
        if os.path.exists(dst):
            continue
        if not os.path.exists(src):
            print(f"WARNING: {src} not found — the stream_enrich cell "
                  "will fail on this corpus; point SPARK_GRAFT_DIM_SRC "
                  "at a directory with customer/nation parquet",
                  file=sys.stderr)
            continue
        if os.path.isdir(src):
            _shutil.copytree(src, dst)
        else:
            _shutil.copy2(src, dst)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", nargs="+", type=int, default=[1, 3, 10])
    ap.add_argument("--out", default="/tmp/scale_corpora")
    ap.add_argument("--cells", nargs="+", default=CELLS)
    # Heaps-law vocabulary scaling: vocab(m) = VOCAB * m**beta. The
    # default 0.0 keeps the original fixed-20k-vocab corpora (and
    # their merged minima) untouched. beta=0.5 is the documented
    # 100-TB operating point (web-corpus Heaps exponent ~0.5): with a
    # FIXED vocab, per-shingle document frequency grows linearly in
    # corpus size, so random shared-shingle candidates grow ~C(f,2)
    # quadratically BY CONSTRUCTION of the corpus — a property of the
    # saturated-diversity workload, not of the algorithms (output
    # pair count stays exactly linear: the planted dups). Cells
    # measured with beta != 0 are recorded under "<cell>@vb<beta>"
    # so the two regimes never mix in the minima merge.
    ap.add_argument("--vocab-beta", type=float, default=0.0)
    # Zipf(s=1)-keyed events corpora (user 0 owns ~ln2/lnN of all
    # events): the skewed regime the salted join / AQE skew handling
    # is FOR. Cells measured with --zipf record under "<cell>@zipf"
    # keys so the regimes never mix in the minima merge; only
    # events-keyed cells are valid against these corpora.
    ap.add_argument("--zipf", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # ladder corpora exceed the IVF probe's oracle regime by design
    # (k scales past N_CENTROIDS); no oracle compare happens here
    os.environ.setdefault("SPARK_GRAFT_IVF_SCALE_OK", "1")
    from last_minute_legends_spark.session import get_spark
    from last_minute_legends_spark.plans.queries import QUERIES

    spark = get_spark("llm-spark-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def vocab_for(m: int) -> int:
        return VOCAB if not args.vocab_beta else int(VOCAB * m ** args.vocab_beta)

    need_doc = any(c not in TPCH_CELLS for c in args.cells)
    need_tpch = any(c in TPCH_CELLS for c in args.cells)
    if args.zipf:
        # The stream-stream joins are deliberately NOT zipf-ladderable:
        # the run-to-completion harness delivers the whole corpus in ONE
        # micro-batch (staged_file_count's correctness contract), so
        # watermark state eviction never runs mid-batch and a Zipf hot
        # key's probes grow QUADRATICALLY in its full corpus share
        # (~29e9 same-key pair evaluations at x30 — measured as a wedged
        # cell, r14). That is an artifact of one-batch staging, not of
        # the state-store join: a production deployment's continuous
        # batches keep per-key state at rate x horizon, making hot-key
        # probe cost linear in rate. The batch-side skew cells carry the
        # measured Zipf story.
        # r15: the multi-batch forms ARE zipf-ladderable — watermark-
        # ordered group delivery runs state eviction mid-corpus, so a
        # hot key's per-batch state is bounded (see _mb_join_cell)
        _ZIPF_OK = {"stream_join_mb", "stream_outer_join_mb",
                    "stream_join_agg_mb",
                    "skew_join", "bloom_semi_join", "sessionization", "cohort_retention",
                    "events_by_type", "events_windowed", "latest_by_user",
                    "moving_avg", "events_quantiles", "rollup_timeseries",
                    "funnel", "user_segmentation", "json_props",
                    "events_sketches", "events_hll_replay",
                    "events_hist_quantile"}
        bad = [c for c in args.cells if c not in _ZIPF_OK]
        if bad:
            ap.error(f"--zipf corpora carry only events (+ copied dims); "
                     f"not events-keyed: {bad}")
    dirs = {m: ensure_corpus(spark, m, args.out, vocab=vocab_for(m),
                             zipf=args.zipf)
            for m in args.mults} if need_doc else {}
    tpch_dirs = {m: ensure_tpch(spark, m, args.out)
                 for m in args.mults} if need_tpch else {}

    # warmup (JVM + codegen + python daemon fleet)
    if args.zipf:
        warm = ("events_by_type", dirs)
    else:
        warm = (("dedup_exact", dirs) if need_doc
                else ("q1_pricing_summary", tpch_dirs))
    QUERIES[warm[0]](spark, warm[1][args.mults[0]]).write.mode(
        "overwrite").format("noop").save()

    results: dict[str, dict] = {}
    for name in args.cells:
        src = tpch_dirs if name in TPCH_CELLS else dirs
        fn = SPECIAL_CELLS.get(name) or QUERIES[name]
        per_mult: dict[str, float] = {}
        rows: dict[str, int] = {}
        # per-cell warmup at the smallest mult: whole-stage codegen
        # compiles once per plan SHAPE and is then cached across input
        # paths, so without this the smallest mult absorbs the one-time
        # compile cost and the fitted exponent is deflated (observed:
        # jaccard x1 13.1 s > x3 7.8 s on the first full run)
        fn(spark, src[min(args.mults)]).write.mode(
            "overwrite").format("noop").save()
        spark.catalog.clearCache()
        for m in args.mults:
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, src[m]).write.mode(
                    "overwrite").format("noop").save()
                times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            per_mult[str(m)] = round(min(times), 3)
            rows[str(m)] = fn(spark, src[m]).count()
            spark.catalog.clearCache()
        key = (name if not args.vocab_beta
               else f"{name}@vb{args.vocab_beta:g}")
        if args.zipf:
            key = f"{name}@zipf"
        results[key] = {"sec": per_mult, "rows": rows,
                        "loadavg_1m": round(os.getloadavg()[0], 2)}
        print(f"{name:24s} " +
              " ".join(f"x{m}={per_mult[str(m)]:7.3f}s" for m in args.mults) +
              f"  rows {'/'.join(str(rows[str(m)]) for m in args.mults)}",
              flush=True)

    # Merge into scale_local.json taking the per-(cell, mult) MINIMUM
    # across invocations: this box suffers intermittent hypervisor
    # throttling invisible to the guest (nonzero vmstat steal; the
    # r7/r8 bench contamination signature), inflating any single run
    # 2-10x. Minima over repeated runs converge on the uncontended
    # time — throttling can slow a run, never speed one up — and the
    # exponent is fitted on the merged minima.
    out_json = os.path.join(REPO, "scale_local.json")
    try:
        with open(out_json) as f:
            payload = json.load(f)
    except (OSError, ValueError):
        payload = {}
    cells = payload.setdefault("cells", {})
    for name, rec in results.items():
        old = cells.get(name, {})
        sec = dict(old.get("sec", {}))
        for m, v in rec["sec"].items():
            sec[m] = min(sec.get(m, v), v)
        runs = old.get("runs", 0) + 1
        # fit on the MERGED minima's full mult span, not this
        # invocation's --mults: a single-mult top-up run (e.g. a
        # re-measure of x100 alone) must extend the fit, not clobber
        # the recorded exponent with None
        ms = sorted(int(m) for m in sec)
        lo, hi = str(ms[0]), str(ms[-1])
        exp = None
        if lo != hi and sec.get(lo, 0) > 0 and sec.get(hi):
            exp = round(math.log(sec[hi] / sec[lo])
                        / math.log(ms[-1] / ms[0]), 3)
        cells[name] = {"sec": sec, "rows": rec["rows"], "runs": runs,
                       "exponent": exp,
                       "loadavg_1m": rec["loadavg_1m"]}
        print(f"merged {name}: " +
              " ".join(f"x{m}={sec[m]:.3f}" for m in sorted(sec, key=int)) +
              f" exponent={exp} ({runs} runs)", flush=True)
    payload.update({
        "base_docs": BASE_DOCS, "base_vecs": BASE_VECS, "dim": DIM,
        "mults": args.mults,
        "note": ("per-(cell,mult) MIN across repeated fresh-JVM runs "
                 "(min-of-2 within a run), noop sink, registry "
                 "callables on generated corpora, per-cell warmup at "
                 "the smallest mult; minima defeat the intermittent "
                 "host throttling this box exhibits; fixed ~0.2-0.5s "
                 "job-scheduling overhead still deflates exponents of "
                 "sub-second cells"),
    })
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
