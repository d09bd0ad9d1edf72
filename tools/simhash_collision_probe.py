#!/usr/bin/env python
"""Measure the simhash banding's random-collision term at >=1M docs.

BASELINE_LOCAL r9 documented (not hid) the 64-bit limitation: 4x16-bit
banding is the optimal hamming<=3 pigeonhole at 64 bits, but each band
carries a 2^-16 random-collision term — sum over (band, value) buckets
of C(c,2) candidate pairs that are NOT near-dups and must be generated,
shuffled, and hamming-verified only to be discarded. At n docs the
uniform-bits estimate is n^2/2 * n_bands / 2^band_width, which crosses
the true-pair count around ~1M docs. The 128-bit formulation
(operators/dedup.py simhash_signatures_wide, engaged automatically at
SIMHASH_WIDE_MIN_DOCS by simhash_pairs' size switch) bands as 4x32 and
pushes the term to 2^-32.

This probe computes, on a generated ladder corpus (tools/scale_bench.py
layout, default the 300x Heaps corpus = 1.5M docs):

- exact band-candidate counts at 64 and 128 bits (groupBy (band, bv) ->
  sum C(c,2) — the same count the pair self-join would materialize,
  without materializing it),
- the uniform-bits prediction for context,
- wall time + verified pair count of the full simhash_pairs run at each
  width.

Results merge into scale_local.json under
``simhash_collision@x{mult}`` so rounds compose. Run:

    python tools/simhash_collision_probe.py [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_corpora/x300v346410"


def main() -> None:
    from pyspark.sql import functions as F

    from last_minute_legends_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
        simhash_signatures_wide,
    )
    from last_minute_legends_spark.session import get_spark

    spark = get_spark("simhash-collision-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(CORPUS, "documents.parquet"))
    n_docs = docs.count()

    def cand_count(sig, words, band_width: int) -> int:
        """Exact candidate-pair count of the banded self-join:
        sum over (band, value) buckets of C(c, 2)."""
        bands_per_word = 64 // band_width
        mask = (1 << band_width) - 1
        bands = F.array(*[
            F.struct(
                F.lit(w * bands_per_word + k).alias("band"),
                (F.shiftright(words[w], band_width * k)
                 .bitwiseAND(F.lit(mask))).alias("bv"),
            )
            for w in range(len(words))
            for k in range(bands_per_word)
        ])
        ex = sig.select(F.explode(bands).alias("bs")).select("bs.band", "bs.bv")
        row = (ex.groupBy("band", "bv").count()
               .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("c"))
               .collect()[0])
        return int(row.c)

    out: dict = {"corpus": CORPUS, "n_docs": n_docs}
    for label, width, bits in (("64", 16, 64), ("128", 32, 128)):
        t0 = time.perf_counter()
        if bits == 64:
            sig = simhash_signatures(docs).persist()
            words = ["simhash"]
        else:
            sig = simhash_signatures_wide(docs, n_bits=128).persist()
            words = ["sh0", "sh1"]
        sig.count()
        sig_sec = time.perf_counter() - t0
        cands = cand_count(sig, words, width)
        n_bands = 64 * len(words) // width
        uniform = n_docs * n_docs / 2 * n_bands / 2 ** width
        t1 = time.perf_counter()
        pairs = simhash_pairs(docs, max_hamming=3, n_bits=bits).count()
        pair_sec = time.perf_counter() - t1
        sig.unpersist()
        out[label] = {
            "band_candidates": cands,
            "uniform_estimate": round(uniform),
            "verified_pairs": pairs,
            "sig_sec": round(sig_sec, 2),
            "pairs_sec": round(pair_sec, 2),
        }
        print(label, out[label], flush=True)

    mult = os.path.basename(CORPUS.rstrip("/")).split("v")[0].lstrip("x")
    path = os.path.join(REPO, "scale_local.json")
    merged = json.load(open(path)) if os.path.exists(path) else {"cells": {}}
    merged["cells"][f"simhash_collision@x{mult}"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
