#!/bin/bash
# One fresh JVM per cell: isolates each scaling exponent from the
# old-gen GC pressure a shared long-lived local[32] JVM accumulates
# (measured up to 3x inflation on late cells in whole-suite runs).
# Results merge into scale_local.json across invocations.
set -e -o pipefail
cd "$(dirname "$0")/.."
MULTS="${*:-1 3 10}"
# SCALE_FRESH=1 starts a new scale_local.json; default accumulates
# minima across invocations (the throttling-robust protocol)
[ -n "$SCALE_FRESH" ] && rm -f scale_local.json
CELLS="${SCALE_CELLS:-dedup_exact dedup_ngram_jaccard dedup_minhash_lsh dedup_simhash \
dedup_embedding dedup_clusters ann_ivf_topk ann_quantized_topk \
curated_training_set sessionization rollup_timeseries events_quantiles \
latest_by_user funnel json_props \
moving_avg user_segmentation events_by_type user_pivot events_windowed \
text_langid text_quality text_tfidf_topterms text_vocab_topk \
corpus_stats text_unigram_logprob train_bpe bpe_tokenize \
text_pii_redact text_repetition dedup_paragraph pack_shards \
mixture_sample decontaminate training_set train_val_split \
multimodal_features multimodal_framesample multimodal_resize \
stream_pipeline stream_sessionize stream_enrich stream_dedup stream_curate \
events_sketches stream_json_parse events_avro_roundtrip}"
FAILED=""
for c in $CELLS; do
    # stderr goes to a per-cell log (Spark chatter would drown the
    # table) but a crashed cell must NEVER look like a measured one:
    # record it and say so at the end.
    # shellcheck disable=SC2086
    if python tools/scale_bench.py --mults $MULTS --cells "$c" \
            2>"/tmp/scale_bench_$c.err" | grep -E "^$c"; then
        :
    else
        FAILED="$FAILED $c"
        echo "FAILED: $c (stderr tail follows)" >&2
        tail -5 "/tmp/scale_bench_$c.err" >&2
    fi
done
if [ -n "$FAILED" ]; then
    echo "scale_bench: cells FAILED and are missing/stale in scale_local.json:$FAILED" >&2
    exit 1
fi
