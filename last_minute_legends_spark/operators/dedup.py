"""Deduplication operators for LLM training-data pipelines.

Five tiers, all candidate generation by *equi-join* (never an
all-pairs cross join — the cardinal rule at 100 TB):

- exact:      md5(normalized text) hash-groupBy — one shuffle.
- n-gram Jaccard: exact all-pairs-similarity via *prefix filtering*
  (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07;
  Xiao et al., PPJoin, WWW'08): each doc indexes only its
  |A| − ⌈t·|A|⌉ + 1 globally-rarest shingles; any pair with
  Jaccard ≥ t provably collides on one of them, so the candidate
  self-join touches rare keys only — hot (high-df) shingles are
  structurally excluded from the join. A verify pass recomputes the
  exact intersection for candidates, so the result is identical to
  the naive shared-shingle join at a fraction of its pair mass.
- MinHash+LSH: 32 xxhash64 permutations → 8 bands × 4 rows; banded
  equi-join produces candidates, full-shingle join verifies. Bounded
  false-negative rate, shuffle-partitionable, never O(n²).
- SimHash:    64-bit majority-vote signature over token hashes
  (exploded tokens + 64 codegen'd sum aggs, all JVM-side); 16-bit
  band equi-join for candidates; bit_count(xor) Hamming verify.
- Embedding:  sign-bit random-hyperplane LSH (Charikar, STOC'02)
  over an array<float> embedding column; banded signature equi-join
  for candidates, exact cosine verify.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from last_minute_legends_spark.functions.text import (
    normalize_text,
    word_shingles,
    words,
)
from last_minute_legends_spark.functions.vectors import cosine

N_PERM = 32          # minhash permutations
N_BANDS = 8          # → 4 rows per band
ROWS_PER_BAND = N_PERM // N_BANDS


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition to an explicit defaultParallelism-by-id layout.

    CPU-heavy narrow stages (shingling, signature passes) serialize on
    a low-split scan (one small parquet file locally; few or skewed
    splits at scale). The explicit partition count keeps AQE from
    coalescing the tiny byte size back to one partition — the point is
    CPU spread, not byte balance. The shuffle moves only the raw
    input rows, strictly less than the exploded data every consumer
    shuffles right after."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(id_col))


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
    """(doc_id, s, n_sh) exploded rows, distinct per doc; ``n_sh`` is
    the doc's distinct-shingle count, stamped on every row.

    The input is repartitioned by id first: shingling is CPU-heavy
    narrow compute, and a low-split scan (one small parquet file
    locally; few/skewed splits at scale) would serialize it. The
    shuffle moves only raw text — strictly less than the exploded
    shingle shuffle every consumer performs right after.

    ``n_sh`` rides along from the pre-explode array size so no
    consumer ever needs a second window pass or a groupBy+join just
    to learn set sizes — the prefix math, the PPJoin length /
    positional filters, and the Jaccard denominator all read it off
    the row.

    Two plan traps, both measured ~10-17× at sf0.1, shape this
    formulation:

    - ``size()`` MUST be projected BEFORE the explode: placed after
      it, the Generate has to emit the whole shingle array on every
      exploded row to feed the downstream ``size()`` (O(doc_len²)
      row bytes).
    - the explode must be the OUTER variant: with a plain
      ``explode`` over an attribute, ``InferFiltersFromGenerate``
      infers ``size(_sh) > 0`` and predicate pushdown drags that —
      with the full shingling expression substituted in — through
      the spread Exchange onto the raw scan, re-running the entire
      tokenization serially on the unspread file split(s).
      ``explode_outer`` is exempt from the rule (it must keep
      empty-array rows); the explicit ``isNotNull(s)`` filter
      afterwards restores inner-explode semantics and cannot sink
      below the Generate that produces ``s``."""
    sized = _spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("_sh"),
    ).select("doc_id", "_sh", F.size(F.col("_sh")).alias("n_sh"))
    return sized.select(
        "doc_id",
        F.explode_outer(F.col("_sh")).alias("s"),
        "n_sh",
    ).filter(F.col("s").isNotNull())


def _prefix_index(sh: DataFrame, threshold: float) -> DataFrame:
    """(doc_id, s, n_sh, rn) prefix rows from an exploded shingle
    frame — THE single home of the ⌈t·|A|⌉ prefix math
    (doc_shingle_profiles and jaccard_pairs both build on it, so the
    formula cannot drift). ⌈t·|A|⌉ is computed with a −1e-9 nudge so
    float error can only LENGTHEN the prefix (extra candidates are
    harmless; a short prefix would lose recall). ``rn`` is the
    shingle's 1-based position in the doc's rare-first order —
    jaccard_pairs' positional filter needs it."""
    from pyspark.sql import Window

    df_tbl = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    order = Window.partitionBy("doc_id").orderBy("df", "s")
    ranked = sh.join(df_tbl, "s").select(
        "doc_id", "s", "n_sh",
        F.row_number().over(order).alias("rn"),
    )
    plen = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9)) + 1
    ).cast("int")
    return ranked.filter(F.col("rn") <= plen).select("doc_id", "s", "n_sh", "rn")


def doc_shingle_profiles(docs: DataFrame, threshold: float,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3) -> DataFrame:
    """Per-doc prefix-filter index as ROWS: (doc_id, s, n_sh) — one
    row per prefix shingle, where the prefix is the doc's
    p = |A| − ⌈t·|A|⌉ + 1 globally-rarest distinct shingles (document
    frequency ascending, shingle value tiebreak) — the prefix-filter
    index (Bayardo et al. WWW'07 / PPJoin WWW'08).

    Prefix principle (provable): if |A∩B| ≥ α then the
    (|A|−α+1)-prefix of A and of B under ANY shared total order must
    intersect. Jaccard ≥ t implies |A∩B| ≥ ⌈t·max(|A|,|B|)⌉ ≥ ⌈t·|A|⌉,
    so pairs at threshold always collide inside the prefixes — with
    the rare-first order, on a LOW-df shingle.

    Row-width safety: the index is exploded rows, NOT per-doc arrays
    (the r3 formulation carried every doc's full sorted shingle array
    in one ``collect_list`` row — a book-length outlier would bloat
    executor rows at 100×). A long doc here is just MORE rows; the
    per-doc ordering is a doc_id-partitioned window (row_number over
    the doc's shingle rows), never a materialized array.
    """
    return _prefix_index(
        _shingle_sets(docs, id_col, text_col, n), threshold
    ).select("doc_id", "s", "n_sh")


def jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold — EXACT, via prefix
    filtering plus PPJoin's length and positional filters.

    Candidates come from a self-join over each doc's rare-shingle
    prefix only (see doc_shingle_profiles): lossless at the threshold,
    and the join never touches high-df shingles, so one common phrase
    can't blow up a shuffle partition (the naive shared-shingle join
    emits df² rows per shingle — the skew bomb this replaces). Two
    further lossless pre-verify filters (Xiao et al., PPJoin, WWW'08)
    run inside the candidate join itself:

    - length: J(A,B) ≥ t ⟹ |A∩B| ≥ t·max(|A|,|B|) and
      |A∩B| ≤ min(|A|,|B|), so min ≥ t·max — size-mismatched pairs
      never reach verification.
    - positional: J ≥ t ⟹ |A∩B| ≥ α = ⌈t/(1+t)·(|A|+|B|)⌉, and a
      prefix collision at rare-first positions (i, j) bounds the
      overlap by 1 + min(|A|−i, |B|−j) (every common shingle other
      than the first sits strictly after it in BOTH docs' shared
      order). The first common shingle of a qualifying pair always
      collides inside both prefixes (it precedes whichever common
      shingle the prefix principle guarantees there), and for that
      row the bound ≥ α holds — so dropping collision rows whose
      bound falls below α never drops a qualifying pair.

    Both filters only read (n_sh, rn) already stamped on the prefix
    rows — no extra shuffle — and each candidate they kill removes a
    |A|+|B|-row enumeration from the verify join, the largest shuffle
    in the pipeline (measured sf0.1: 118k raw prefix candidates for
    256 true pairs; the filters cut the verify input ~20×). The
    verify pass computes the exact |∩| per surviving pair by joining
    the candidate list back to the exploded shingle rows and counting
    matches — an equi-join + groupBy, no per-doc arrays anywhere, so
    executor row width is independent of document length. Jaccard is
    exact integer division and Spark and the SQL oracle agree
    bit-for-bit.
    """
    # the exploded shingles feed the df table, the prefix index, and
    # both verify sides; a diamond this wide re-evaluates the shingle
    # pipeline per branch unless persisted (MEMORY_AND_DISK default;
    # Spark LRU evicts)
    sh = _shingle_sets(docs, id_col, text_col, n).persist()
    pref = _prefix_index(sh, threshold)
    a, b = pref.alias("a"), pref.alias("b")
    na, nb = F.col("a.n_sh"), F.col("b.n_sh")
    # required overlap α, nudged DOWN so float error can only loosen
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (na + nb) - F.lit(1e-9)
    )
    length_ok = F.least(na, nb) >= F.lit(threshold) * F.greatest(na, nb) - F.lit(1e-9)
    position_ok = (
        F.lit(1) + F.least(na - F.col("a.rn"), nb - F.col("b.rn")) >= alpha
    )
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               & length_ok & position_ok)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            na.alias("na"), nb.alias("nb"),
        )
        .distinct()
    )
    # exact verify over exploded rows (same persisted shingle frame);
    # na/nb ride the candidate rows so no sizes table is rebuilt
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = (
        cand.join(sha, "doc_a").join(shb, "doc_b")
        .filter(F.col("sa") == F.col("sb"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _xx_perm_hash(s, i: int):
    """Default permutation hash: xxhash64(shingle, perm-index) — the
    fastest JVM-codegen path. Injectable (see minhash_lsh_pairs) so
    the cross-engine replay test can substitute an md5-prefix hash
    that DuckDB computes identically."""
    return F.xxhash64(s, F.lit(i))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       perm_hash=None) -> DataFrame:
    """(doc_id, h0..h{N_PERM-1}) minhash signature columns."""
    perm_hash = perm_hash or _xx_perm_hash
    sh = _shingle_sets(docs, id_col, text_col, n)
    aggs = [
        F.min(perm_hash(F.col("s"), i)).alias(f"h{i}")
        for i in range(N_PERM)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _signature_bands(sh: DataFrame, perm_hash, band_hash) -> DataFrame:
    """(doc_id, n_sh, band, bv) LSH band rows from an exploded shingle
    frame. n_sh comes out of the SAME signature groupBy (stamped on
    every shingle row by _shingle_sets) — no separate sizes table, and
    it rides the band rows into the candidate join where the lossless
    PPJoin length filter (min ≥ t·max, see jaccard_pairs) prunes
    size-mismatched collisions before the verify enumeration."""
    aggs = [
        F.min(perm_hash(F.col("s"), i)).alias(f"h{i}")
        for i in range(N_PERM)
    ]
    sig = sh.groupBy("doc_id").agg(F.min("n_sh").alias("n_sh"), *aggs)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            band_hash(*[F.col(f"h{b * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)]).alias("bv"),
        )
        for b in range(N_BANDS)
    ])
    return sig.select("doc_id", "n_sh", F.explode(bands).alias("bs")).select(
        "doc_id", "n_sh", F.col("bs.band").alias("band"), F.col("bs.bv").alias("bv")
    )


def minhash_lsh_cross(corpus: DataFrame, reference: DataFrame,
                      threshold: float = 0.8, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      perm_hash=None, band_hash=None,
                      max_broadcast_candidates: int = 2_000_000) -> DataFrame:
    """Asymmetric MinHash-LSH: near-matches of a big ``corpus``
    against a SMALL ``reference`` set (fuzzy decontamination — train
    corpus vs eval benchmarks — or any corpus-vs-allowlist/blocklist
    shape). Returns (doc_id, ref_doc_id, jaccard) for every corpus
    doc whose true shingle Jaccard with a reference doc is ≥ t
    (modulo LSH misses, ~0.5% at t=0.8 with 8×4 banding).

    Scale shape — what makes this different from running
    minhash_lsh_pairs on the union: the reference side (band rows AND
    its exploded shingles) is BROADCAST, so the corpus crosses the
    wire exactly once, as map-side-combined signature partials
    (N_PERM longs per doc per map partition); candidate verification
    joins corpus shingles to the broadcast reference shingles with no
    corpus×corpus pairing anywhere. A 100 TB corpus against a
    few-thousand-doc eval suite never shuffles its text and never
    self-joins. The reference side must fit in a broadcast (~eval
    suites do); for reference sets beyond that, fall back to
    minhash_lsh_pairs on the union, which co-shuffles both sides.

    The CANDIDATE set is bounded only by how contaminated the corpus
    is: a heavily contaminated corpus (this operator's own use case)
    can make it corpus-scale. So the candidate broadcast is
    size-gated: candidates are persisted and counted (the count
    materializes the signature pass once — the verify join then reads
    it from cache, so the gate costs no extra corpus pass); at or
    under ``max_broadcast_candidates`` (default 2M ids+sizes ≈
    tens of MB) they broadcast into the verify join so corpus
    shingles never shuffle, above it the verify join falls back to a
    shuffled join on doc_id — slower (the matched corpus docs'
    shingles cross the wire) but never a driver/broadcast OOM.

    The two persisted shingle frames stay cached for the caller's
    materialization of the returned (lazy) DataFrame and are then
    reclaimed by Spark's LRU block eviction — same lifecycle as
    minhash_lsh_pairs; an explicit unpersist here would fire before
    the caller's action and just silently drop the cache benefit.

    ``perm_hash`` / ``band_hash`` are injectable exactly as in
    minhash_lsh_pairs (the portable md5 forms make the whole pipeline
    DuckDB-replayable — plans/curation_q.py::decontaminate_fuzzy
    registers that form as its driver-gate oracle)."""
    perm_hash = perm_hash or _xx_perm_hash
    band_hash = band_hash or F.xxhash64
    sh_c = _shingle_sets(corpus, id_col, text_col, n).persist()
    sh_r = _shingle_sets(reference, id_col, text_col, n).persist()
    cb = _signature_bands(sh_c, perm_hash, band_hash).alias("a")
    rb = F.broadcast(_signature_bands(sh_r, perm_hash, band_hash)).alias("b")
    na, nb = F.col("a.n_sh"), F.col("b.n_sh")
    length_ok = F.least(na, nb) >= F.lit(threshold) * F.greatest(na, nb) - F.lit(1e-9)
    cand = (
        cb.join(rb, (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bv") == F.col("b.bv")) & length_ok)
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("ref_doc_id"),
            na.alias("na"), nb.alias("nb"),
        )
        .distinct()
    )
    sha = sh_c.select(F.col("doc_id"), F.col("s").alias("sa"))
    shb = F.broadcast(
        sh_r.select(F.col("doc_id").alias("ref_doc_id"), F.col("s").alias("sb"))
    )
    # broadcast cand when small (the usual case — the verify join then
    # never shuffles the corpus shingle frame, the exact cost this
    # operator exists to avoid); a heavily contaminated corpus makes
    # cand corpus-scale, so gate on its actual count rather than risk
    # a driver/broadcast OOM
    cand = cand.persist()
    cand_side = (F.broadcast(cand)
                 if cand.count() <= max_broadcast_candidates else cand)
    inter = (
        cand_side.join(sha, "doc_id").join(shb, "ref_doc_id")
        .filter(F.col("sa") == F.col("sb"))
        .groupBy("doc_id", "ref_doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "ref_doc_id", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.8,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, perm_hash=None, band_hash=None) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH candidates, verified with
    the true shingle Jaccard (so output = jaccard_pairs minus any
    LSH false negatives — at 8 bands × 4 rows the miss rate at
    j=0.8 is (1-0.8^4)^8 ≈ 0.5%%).

    ``perm_hash(shingle_col, i) -> Column`` and
    ``band_hash(*h_cols) -> Column`` default to the xxhash64 forms
    (production hot path, JVM codegen). They are injectable ONLY so
    tests/test_hash_replay.py can run the identical pipeline with an
    md5-prefix hash both Spark and DuckDB compute bit-for-bit, turning
    the banding/min-agg/verify arithmetic into a full cross-engine
    value check (xxhash64 exists in no second engine)."""
    perm_hash = perm_hash or _xx_perm_hash
    band_hash = band_hash or F.xxhash64
    # shingles feed the signature pass, both verify sides, and sizes —
    # persist the exploded frame once (LRU-evicted, disk-spillable)
    sh = _shingle_sets(docs, id_col, text_col, n).persist()
    # the banded frame feeds BOTH sides of the self-join and Spark
    # does not reuse the aggregation exchange across the two aliases —
    # without this persist the 32-hash signature pass (the pipeline's
    # dominant cost, worse still under the md5 replay hash) executes
    # twice (measured r15: plan showed 2 signature HashAggregates,
    # 0 ReusedExchange). docs × N_BANDS rows — small, memory+disk.
    exploded = _signature_bands(sh, perm_hash, band_hash).persist()
    a, b = exploded.alias("a"), exploded.alias("b")
    na, nb = F.col("a.n_sh"), F.col("b.n_sh")
    length_ok = F.least(na, nb) >= F.lit(threshold) * F.greatest(na, nb) - F.lit(1e-9)
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               & length_ok)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            na.alias("na"), nb.alias("nb"),
        )
        .distinct()
    )
    # verify candidates with the true Jaccard (same persisted shingles)
    sha = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = (
        cand.join(sha, "doc_a").join(shb, "doc_b")
        .filter(F.col("sa") == F.col("sb"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", token_hash=None) -> DataFrame:
    """(doc_id, simhash) — 64-bit signature per document: for each
    bit, majority vote of the distinct-token hashes' bit values
    (ties → 0).

    Formulation: explode the distinct tokens and aggregate 16
    PACKED counters in ONE groupBy: long ``p_j`` holds four 16-bit
    set-bit counts (bits j, j+16, j+32, j+48), so bit b's majority
    is ``2*cnt_b > n_tokens`` with ``cnt_b = (p_{b%16} >> 16*(b//16))
    & 0xFFFF``. All whole-stage codegen with map-side partial
    aggregation; the shuffle carries 17 longs per (doc × map
    partition) — the r4 formulation's 64 separate ``sum((h>>b&1)*2-1)``
    aggs were ~2× slower per row and 4× wider on the wire (the r3
    nested ``aggregate(sequence(0,63), ...)`` higher-order expression
    before that was interpreted eval, ~7 s at sf0.1). The 16-bit
    fields overflow at 65,536 distinct tokens per document — a
    codegen'd ``assert_true`` raises rather than corrupting
    signatures (pre-chunk such documents upstream). No repartition
    before the narrow stage: the scan's own splits carry the
    parallelism at scale, and the explicit spread shuffle measured
    ~3x the whole aggregation locally. ``explode_outer`` keeps empty
    documents (n=0 → every majority fails → simhash 0, matching the
    fold-over-empty-array semantics).

    ``token_hash(token_col) -> Column`` defaults to xxhash64 (the
    production path); injectable only for the DuckDB cross-engine
    replay (tests/test_hash_replay.py) — a 60-bit md5-prefix hash
    leaves bits 60-63 zero on both engines, so the replay exercises
    the packed-counter majority arithmetic bit-for-bit."""
    token_hash = token_hash or F.xxhash64
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(words(F.col(text_col)))).alias("t"),
    ).select(
        "doc_id",
        F.when(F.col("t").isNotNull(), token_hash(F.col("t"))).alias("h"),
    )
    sums = toks.groupBy("doc_id").agg(
        F.count("h").alias("n"), *_packed_counter_exprs("h", "p"))
    return sums.selectExpr(
        "doc_id", f"({_majority_word_sql('p')} | {_OVERFLOW_GUARD}) AS simhash")


def _packed_counter_exprs(h: str, pfx: str) -> list:
    """The 16 packed set-bit counters for one 64-bit hash column
    ``h``: long ``{pfx}{j}`` holds four 16-bit counts (bits j, j+16,
    j+32, j+48). Built as SQL strings: composing them from pyspark
    Column operators costs a py4j round-trip per node (~1000
    round-trips, measured 3.6 s of pure driver-side construction —
    more than the job)."""
    return [
        F.expr(
            f"sum((({h} >> {j}) & 1)"
            f" + ((({h} >> {j + 16}) & 1) << 16)"
            f" + ((({h} >> {j + 32}) & 1) << 32)"
            f" + ((({h} >> {j + 48}) & 1) << 48)) AS {pfx}{j}"
        )
        for j in range(16)
    ]


def _majority_word_sql(pfx: str) -> str:
    """64-term majority word over the ``{pfx}*`` packed counters."""
    return " | ".join(
        f"(CASE WHEN ((coalesce({pfx}{b % 16}, 0L) >> {16 * (b // 16)}) & 65535) * 2 > n"
        f" THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(64)
    )


_OVERFLOW_GUARD = ("coalesce(cast(assert_true(n <= 65535, "
                   "'simhash: >65535 distinct tokens in one document "
                   "overflows the packed 16-bit counters') AS bigint), 0L)")


# Size switch for the signature width. The 64-bit 4x16 banding is the
# optimal hamming<=3 pigeonhole at 64 bits, but each band carries a
# 2^-16 random-collision term — n^2/2 * 4/65536 spurious band hits
# that the BASELINE_LOCAL r9 ladder shows becoming visible past ~1M
# docs. At 128 bits the same pigeonhole bands as 4x32 and the term
# drops to 2^-32 (a 65536x reduction), at ~2x the aggregation cost.
SIMHASH_WIDE_MIN_DOCS = 1_000_000


def simhash_bits(n_docs: int) -> int:
    """64 below SIMHASH_WIDE_MIN_DOCS documents, 128 at or above."""
    return 128 if n_docs >= SIMHASH_WIDE_MIN_DOCS else 64


def simhash_signatures_wide(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n_bits: int = 128,
                            token_hash=None, word_hash=None) -> DataFrame:
    """(doc_id, sh0[, sh1]) — an ``n_bits``-bit simhash as
    ``n_bits//64`` signature words. Word 0 is bit-for-bit
    ``simhash_signatures``'s output (same token hash, same packed-
    counter majority — parity-locked by
    test_simhash_wide_64_matches_legacy); word w >= 1 majority-votes
    the bits of the independent hash ``xxhash64(t, w)``. One groupBy
    carries all 16*n_words packed counters — widening the signature
    adds counter columns to the SAME shuffle, not a second pass over
    the corpus. ``token_hash`` (word 0) and ``word_hash(col, w)``
    (words >= 1) are injection points for cross-engine replay only
    (tests/test_hash_replay.py)."""
    if n_bits not in (64, 128):
        raise ValueError(f"n_bits must be 64 or 128, got {n_bits}")
    n_words = n_bits // 64
    token_hash = token_hash or F.xxhash64
    word_hash = word_hash or (lambda c, w: F.xxhash64(c, F.lit(w)))
    hcols = []
    for w in range(n_words):
        hc = (token_hash(F.col("t")) if w == 0
              else word_hash(F.col("t"), w))
        hcols.append(F.when(F.col("t").isNotNull(), hc).alias(f"h{w}"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(words(F.col(text_col)))).alias("t"),
    ).select("doc_id", *hcols)
    packed = []
    for w in range(n_words):
        packed += _packed_counter_exprs(f"h{w}", f"w{w}p")
    sums = toks.groupBy("doc_id").agg(F.count("h0").alias("n"), *packed)
    outs = [
        f"({_majority_word_sql(f'w{w}p')}"
        + (f" | {_OVERFLOW_GUARD}" if w == 0 else "")
        + f") AS sh{w}"
        for w in range(n_words)
    ]
    return sums.selectExpr("doc_id", *outs)


def hamming_band_pairs(sig: DataFrame, sig_words: list[str],
                       word_bits: list[int], band_width: int,
                       max_hamming: int,
                       id_col: str = "doc_id") -> DataFrame:
    """Banded hamming join over a signature frame: candidates equal
    in at least one ``band_width``-bit band of the concatenated
    ``sig_words`` (pigeonhole — recall guaranteed for hamming <
    n_bands), verified by the exact popcount-of-xor distance, output
    (doc_a, doc_b, hamming) with doc_a < doc_b.

    ONE home for the band-explode/self-join/verify machinery
    (factored out of simhash_pairs in r15): the simhash tiers (one
    64-bit word / two 64-bit words) and the image perceptual-hash
    tier (two 32-bit words — operators/multimodal.py::phash_images
    keeps each word BIGINT-safe because the DuckDB replay cannot
    shift into bit 63) all run through it. ``word_bits[i]`` is how
    many low bits of ``sig_words[i]`` carry signal; each word
    contributes ``word_bits[i] // band_width`` bands. ``sig`` should
    be persisted by the caller — both sides of the self-join read
    it."""
    mask = (1 << band_width) - 1
    structs, bidx = [], 0
    for col, bits in zip(sig_words, word_bits):
        for k in range(bits // band_width):
            structs.append(F.struct(
                F.lit(bidx).alias("band"),
                (F.shiftright(F.col(col), band_width * k)
                 .bitwiseAND(F.lit(mask))).alias("bv"),
            ))
            bidx += 1
    bands = F.array(*structs)
    exploded = sig.select(
        F.col(id_col).alias("doc_id"), *sig_words,
        F.explode(bands).alias("bs"),
    ).select("doc_id", *sig_words,
             F.col("bs.band").alias("band"), F.col("bs.bv").alias("bv"))
    a, b = exploded.alias("a"), exploded.alias("b")
    hamming = F.bit_count(
        F.col(f"a.{sig_words[0]}").bitwiseXOR(F.col(f"b.{sig_words[0]}")))
    for wcol in sig_words[1:]:
        hamming = hamming + F.bit_count(
            F.col(f"a.{wcol}").bitwiseXOR(F.col(f"b.{wcol}")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  token_hash=None, n_bits: int | None = 64,
                  word_hash=None, n_docs: int | None = None) -> DataFrame:
    """Candidate near-dup pairs: equal in at least one band
    (pigeonhole — guarantees recall for hamming < n_bands; good
    heuristic above), verified by the exact signature hamming
    distance <= max_hamming. ``token_hash`` / ``word_hash`` are the
    signature injection points (cross-engine replay only).

    The default is the 64-bit/4x16 signature (the gate/replay-stable
    legacy shape) — a library caller always gets corpus-size-
    INDEPENDENT semantics. Passing ``n_bits=None`` is the explicit
    OPT-IN to the size switch: 64 bits below SIMHASH_WIDE_MIN_DOCS
    documents, 128-bit/4x32 at or above — where the 4x16 banding's
    n^2/2 * 4/2^16 random-collision term would dominate candidate
    generation (see simhash_bits). The count that switch needs is
    skipped when the caller supplies ``n_docs`` (a caller that knows
    its corpus size must not pay an extra eager job for it); with
    ``n_docs=None`` a column-pruned count runs. Note the SAME absolute
    ``max_hamming`` over 2x the bits is a ~2x stricter angular
    threshold — the intended operating point at >=1M docs is
    near-identical documents with a minimal false-candidate surface;
    opt-in callers accepting looser matches should scale max_hamming
    ~2x (losing the pigeonhole guarantee, which only covers
    hamming < n_bands)."""
    if n_bits is None:
        if n_docs is None:
            n_docs = docs.select(F.col(id_col)).count()
        n_bits = simhash_bits(n_docs)
    if n_bits == 64:
        sig_words = ["simhash"]
        # both sides of the band self-join read the signature — persist
        # so the aggregate expression runs once per doc, not twice
        sig = simhash_signatures(docs, id_col, text_col, token_hash).persist()
        band_width = 16
    else:
        sig_words = ["sh0", "sh1"]
        sig = simhash_signatures_wide(
            docs, id_col, text_col, n_bits, token_hash, word_hash).persist()
        band_width = 32
    return hamming_band_pairs(sig, sig_words, [64] * len(sig_words),
                              band_width, max_hamming, id_col="doc_id")


# Below this many edges the component labeling runs as a driver-side
# union-find over the collected pair list instead of iterative
# distributed rounds. The edge list is the OUTPUT of near-dup
# detection — orders of magnitude smaller than the corpus (the 300x
# generated ladder corpus has 1.5M documents but only 75k verified
# pairs) — while every propagation round costs a join + groupBy +
# checkpoint + fixpoint count of fixed scheduling latency. 100k edges
# collect to a few MB and union-find is linear with inverse-Ackermann
# overhead; a graph bigger than this (a 100-TB corpus with billions
# of near-dup pairs) takes the O(diameter) distributed rounds below.
# Same adaptive local-execution pattern as BPE training
# (operators/bpe.py LOCAL_VOCAB_MAX) and Lloyd iterations
# (operators/similarity.py LOCAL_TRAIN_MAX).
LOCAL_EDGES_MAX = 100_000


def _cc_local(spark, edges, id_type) -> DataFrame:
    """Driver-side union-find (path compression + union by smaller
    root) over collected (src, dst) rows; components are relabeled by
    their min member id — exactly the fixpoint min-label propagation
    converges to. Parity locked by test_connected_components_*
    (random-graph cross-check) running both branches."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for src, dst in edges:
        for v in (src, dst):
            if v not in parent:
                parent[v] = v
        ra, rb = find(src), find(dst)
        if ra != rb:
            # min root wins, so roots ARE the min member ids
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = [(v, find(v)) for v in parent]
    # nullable=True on purpose: the distributed min-label branch
    # returns nullable columns (join/agg outputs), and the two
    # branches must present ONE schema to strict consumers regardless
    # of which side of LOCAL_EDGES_MAX the edge list lands on.
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("id", id_type, True),
                            T.StructField("cluster_id", id_type, True)]))


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b", max_iter: int = 25,
                         local_edges_max: int = LOCAL_EDGES_MAX) -> DataFrame:
    """(id, cluster_id) — connected components of the near-dup pair
    graph; cluster_id = min member id (the canonical keeper).

    Iterative min-label propagation (the MapReduce CC family, cf.
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): each round every node takes the min of its own and its
    neighbors' labels — one equi-join + one groupBy per round,
    converging in O(component diameter) rounds (near-dup clusters are
    shallow). Per-round state is localCheckpoint'ed to truncate
    lineage (checkpoint to durable storage on a cluster); the only
    driver-side value is the scalar changed-count that detects the
    fixpoint — label data never leaves the executors.

    Adaptive: an edge list of at most ``local_edges_max`` rows is
    collected and labeled by driver-side union-find instead (see
    LOCAL_EDGES_MAX — identical labels, no per-round scheduling).
    """
    # Materialize the pair list ONCE before anything references it:
    # ``pairs`` usually carries an arbitrarily expensive upstream DAG
    # (candidate generation + verify joins), and every round
    # references ``und`` — without this checkpoint the whole pair
    # pipeline re-executes per round (measured: the r4 clusters entry
    # spent ~20 s re-running the jaccard pipeline each of its rounds).
    # The checkpoint MUST come BEFORE the direction-doubling union:
    # union(pairs, pairs.swapped) plans the candidate pipeline TWICE
    # in one query, and at 100x corpus scale the two concurrent
    # executions' broadcast builds + the persisted shingle frame
    # exceeded a 20 GiB local heap ("Not enough memory to build and
    # broadcast") — checkpointing the directed pairs first runs the
    # expensive DAG once and unions already-materialized rows. The
    # edge list itself is tiny (near-dup pairs), so both checkpoints
    # are cheap.
    directed = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    # adaptive execution: the checkpoint above already materialized
    # the edge list, so this count is a scan of resident rows. Small
    # graphs (see LOCAL_EDGES_MAX) collect and label via union-find
    # on the driver; local_edges_max=0 forces the distributed rounds.
    # Mixed-type endpoint columns (the union below would widen them)
    # and null endpoints (unorderable in union-find) fall through to
    # the distributed branch rather than diverge from it.
    src_t = directed.schema["src"].dataType
    if (local_edges_max and src_t == directed.schema["dst"].dataType
            and directed.count() <= local_edges_max):
        edges = [(r.src, r.dst) for r in directed.collect()]
        if all(s is not None and d is not None for s, d in edges):
            return _cc_local(pairs.sparkSession, edges, src_t)
    und = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
    )
    for _ in range(max_iter):
        msgs = und.join(labels, und["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        nbr = msgs.groupBy("id").agg(F.min("label").alias("nbr_min"))
        # carry the old label through the checkpoint so the fixpoint
        # probe is a scan of already-materialized rows, not another
        # join + shuffle per round
        new = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.col("label").alias("old"),
                F.least(F.col("label"),
                        F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("label") < F.col("old")).count()
        labels = new.select("id", "label")
        if changed == 0:
            break
    else:
        # the loop exhausted max_iter with labels still moving: some
        # component has diameter > max_iter and the labels are NOT a
        # fixpoint — returning them silently would hand the caller
        # wrong cluster ids
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing) — raise "
            "max_iter (component diameter exceeds it)"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


N_PLANES = 64        # sign-LSH signature bits (legacy fixed config)
EMB_BANDS = 8        # → 8 bits per band


def lsh_params(n_vectors: int, threshold: float = 0.95,
               target_recall: float = 0.98,
               cands_per_vector: int = 32) -> tuple[int, int]:
    """(bits_per_band, n_bands) for sign-LSH, sized to the corpus.

    Sign-LSH per-bit agreement for a pair at cosine c is
    p = 1 − arccos(c)/π (0.899 at c=0.95). A RANDOM pair (cos≈0)
    agrees per bit w.p. 1/2, so a b-bit band collides w.p. 2⁻ᵇ and
    expected random candidates are m·n²/2ᵇ⁺¹ — a FIXED band width is
    a quadratic tier in disguise. Measured (tools/scale_bench.py,
    BASELINE_LOCAL r9): the legacy 8×8 config hit 100 s / exponent
    1.28 at 30× sf0.1 — the only superlinear cell in the suite.

    This solves the fixpoint of
        b = ⌈log₂(n·m / cands_per_vector)⌉      (expected random
            candidates ≈ cands_per_vector·n/2 — linear in n)
        m = ⌈ln(1−r) / ln(1−pᵇ)⌉                 (band count restoring
            recall r at the threshold)
    m grows only ~n^0.15 at threshold 0.95, so total candidate volume
    is ~n^1.15 and signature work is b·m ≈ log n · n^0.15 planes per
    vector — the 100 TB path. At sf0.001 sizes the fixpoint lands on
    exactly the legacy 8 bands × 8 bits, so small-scale candidates
    (and the driver-oracle output) are unchanged.
    """
    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    n = max(n_vectors, 2)
    bits, m = 8, 8
    for _ in range(8):  # converges in <=4 iterations in practice
        new_bits = max(8, math.ceil(math.log2(max(n * m / cands_per_vector, 2))))
        new_m = max(4, math.ceil(math.log(1.0 - target_recall)
                                 / math.log(1.0 - p ** new_bits)))
        if (new_bits, new_m) == (bits, m):
            break
        bits, m = new_bits, new_m
    # band values are packed into one long — 63 usable bits
    return min(bits, 63), m


def random_hyperplanes(spark: SparkSession, n_planes: int = N_PLANES,
                       dim: int = 64, seed: int = 1) -> DataFrame:
    """(plane_id, w: array<double>) — deterministic Gaussian random
    hyperplanes, derived from sha256(seed, plane, dim) via Box–Muller
    (reproducible across runs/machines; no RNG state). Tiny: broadcast
    to every executor, never shuffled."""
    def unit(tag: str) -> float:
        h = hashlib.sha256(tag.encode()).digest()
        # (0, 1]: avoid log(0) in Box–Muller
        return (int.from_bytes(h[:8], "big") + 1) / 2.0**64

    rows = []
    for p in range(n_planes):
        w = [
            math.sqrt(-2.0 * math.log(unit(f"{seed}:{p}:{d}:u1")))
            * math.cos(2.0 * math.pi * unit(f"{seed}:{p}:{d}:u2"))
            for d in range(dim)
        ]
        rows.append((p, w))
    return spark.createDataFrame(rows, "plane_id int, w array<double>")


def embedding_signatures_np(emb: DataFrame, planes: DataFrame,
                            id_col: str = "id", vec_col: str = "v") -> DataFrame:
    """Arrow-batched numpy sibling of ``embedding_signatures``: the
    planes matrix (n_planes x dim — driver-built, deterministic,
    tiny) is closed over the mapInPandas workers and each batch
    computes ``V @ W.T`` as ONE BLAS matmul. Bit-for-bit identical
    to the SQL path (parity-tested).

    MEASURED at sf0.1 / local[32] (r5): 1.06 s warm vs 0.64 s for
    the higher-order-function path — Arrow transfer of the float
    vectors outweighs the interpreted expression eval at 64-dim
    embeddings, so the SQL path stays the default. r14 re-measured
    the wide-geometry hypothesis (20k vectors, min-of-2 warm): HOF
    0.68 s vs numpy 1.46 s at 256-dim × 128 planes, 0.76 vs 1.45 at
    256 × 256 — the numpy path's cost is a FLAT Arrow floor
    (serializing n × dim doubles, ~1.45 s here, plane-count
    invariant) while the HOF fold grew only 0.08 s doubling the
    planes, so the crossover sits far beyond any geometry this
    operator family uses (extrapolated ≳2k planes). The SQL path
    stays the default at every measured geometry; reach for this
    sibling only when the vectors are already Python-side or the
    plane count is extreme (BASELINE_LOCAL r14)."""
    import numpy as np
    import pandas as pd

    w_rows = planes.orderBy("plane_id").collect()  # model params, k rows
    W = np.array([list(r.w) for r in w_rows])      # k x dim
    shifts = np.arange(W.shape[0], dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].to_numpy())
            bits = (V @ W.T) > 0
            sig = np.bitwise_or.reduce(
                bits.astype(np.uint64) << shifts, axis=1
            ).view(np.int64)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "sig": sig})

    # repartition: the signature pass is CPU-bound; a single-split
    # scan would serialize all Arrow workers on one core.
    return (
        _spread(emb, id_col)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias(vec_col))
        .mapInPandas(gen, "id long, sig long")
    )


def embedding_signatures(emb: DataFrame, planes: DataFrame,
                         id_col: str = "id", vec_col: str = "v") -> DataFrame:
    """(id, sig) — 64-bit sign-bit signature: bit p = [dot(v, plane_p) > 0].
    Broadcast-join the planes, fold each dot with higher-order-function
    expressions, assemble the word with ``bit_or(shiftleft(...))`` (no
    overflow — bit 63 is the sign bit). No Python in the plan; the
    measured-faster path at 64-dim/64-plane (see
    ``embedding_signatures_np`` for the BLAS sibling and the numbers)."""
    dot_pw = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("w"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    bits = _spread(emb, id_col).join(F.broadcast(planes)).select(
        F.col(id_col).alias("id"),
        F.when(dot_pw > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("bit"),
        "plane_id",
    )
    return bits.groupBy("id").agg(
        F.expr("bit_or(shiftleft(bit, plane_id))").alias("sig")
    )


def embedding_band_values(emb: DataFrame, planes: DataFrame,
                          bits_per_band: int,
                          id_col: str = "id", vec_col: str = "v") -> DataFrame:
    """(id, band, bv) — sign-LSH band values computed DIRECTLY:
    band k's value packs the sign bits of its own ``bits_per_band``
    planes into one long. One broadcast join + one narrow groupBy —
    no intermediate signature word, so the plane count is NOT capped
    at 64 (the adaptive parameters need b·m > 64 at scale)."""
    dot_pw = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("w"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    bits = _spread(emb, id_col).join(F.broadcast(planes)).select(
        F.col(id_col).alias("id"),
        (F.col("plane_id") / F.lit(bits_per_band)).cast("int").alias("band"),
        F.when(dot_pw > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("bit"),
        F.pmod(F.col("plane_id"), F.lit(bits_per_band)).cast("int").alias("pos"),
    )
    return bits.groupBy("id", "band").agg(
        F.expr("bit_or(shiftleft(bit, pos))").alias("bv"))


def embedding_band_values_np(emb: DataFrame, planes: DataFrame,
                             bits_per_band: int,
                             id_col: str = "id",
                             vec_col: str = "v") -> DataFrame:
    """Arrow/BLAS sibling of ``embedding_band_values``: one
    ``V @ W.T`` matmul per batch, then per-band bit packing.
    HYPOTHESIZED faster past ~64 planes; r14 MEASURED the opposite at
    every tried geometry (HOF 0.76 s vs numpy 1.45 s even at 256-dim
    × 256 planes, 20k vectors — the Arrow vector transfer is a flat
    floor the interpreted fold never reaches; BASELINE_LOCAL r14), so
    the HOF path stays the default and this sibling exists for
    Python-side-vector or extreme-plane-count regimes. Bit-for-bit
    identical output (parity-tested)."""
    import numpy as np
    import pandas as pd

    w_rows = planes.orderBy("plane_id").collect()  # model params only
    W = np.array([list(r.w) for r in w_rows])      # (b*m) x dim
    n_planes = W.shape[0]
    n_bands = n_planes // bits_per_band
    weights = (1 << np.arange(bits_per_band, dtype=np.uint64))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].to_numpy())
            bits = ((V @ W.T) > 0).astype(np.uint64)   # n x planes
            bv = (
                bits.reshape(len(pdf), n_bands, bits_per_band) * weights
            ).sum(axis=2).view(np.int64)               # n x bands
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame({
                "id": np.repeat(ids, n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32), len(pdf)),
                "bv": bv.ravel(),
            })

    return (
        _spread(emb, id_col)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias(vec_col))
        .mapInPandas(gen, "id long, band int, bv long")
    )


def embedding_lsh_pairs(emb: DataFrame, planes: DataFrame | None = None,
                        threshold: float = 0.95,
                        n_bands: int = EMB_BANDS,
                        n_vectors: int | None = None) -> DataFrame:
    """Near-dup embedding pairs (cosine >= threshold) via sign-LSH.

    Candidates: pairs equal in at least one signature band — an
    equi-join on (band, value), never all-pairs. A near-dup at cos c
    collides per bit w.p. 1 − arccos(c)/π, giving band recall pᵇ and
    overall 1−(1−pᵇ)ᵐ. Verify is the EXACT cosine, so false
    candidates never leak into the output. ``emb`` as produced by
    operators.similarity.with_unit_vectors: (id, v, nrm).

    With ``planes=None`` (the default, and the scale path) the band
    geometry ADAPTS to the corpus: ``lsh_params`` sizes band width to
    log₂(n) so expected random-pair collisions stay ~linear in n, and
    band count to hold recall ≥0.98 at the threshold. A fixed-width
    config (pass ``planes`` + ``n_bands`` explicitly — the legacy
    8×8 shape the unit tests pin) measured 100 s / exponent 1.28 at
    30× sf0.1 from the n²/2ᵇ random-collision term; the adaptive
    geometry is what makes this tier 100 TB-shaped. ``n_vectors``
    skips the sizing count() when the caller already knows n.
    """
    # emb feeds the signature pass and both verify sides; the band
    # frame feeds both sides of the band self-join — persist both so
    # neither the scan+norm nor the plane fold reruns
    emb = emb.persist()
    n = None
    if planes is None:
        n = n_vectors if n_vectors is not None else emb.count()
        bits_per_band, m = lsh_params(n, threshold)
        dim = emb.select(F.size(F.col("v")).alias("d")).first()["d"]
        n_planes = bits_per_band * m
        planes = random_hyperplanes(emb.sparkSession, n_planes=n_planes, dim=dim)
    else:
        n_planes = planes.count()
        bits_per_band = n_planes // n_bands
    # signature backend, chosen by TOTAL plane-dot volume (A/B at the
    # adaptive geometries, 2026-08-14): the JVM HOF fold wins below
    # ~10M n·planes (Arrow transfer + python-worker startup dominate:
    # 1.6 vs 2.7 s at n=2k/100 planes, 2.9 vs 3.8 s at n=20k/224
    # planes), the BLAS matmul wins above (5.4 vs 11.1 s at n=61k/320
    # planes — the interpreted fold pays per element, BLAS per flop).
    # Legacy explicit-planes callers (n unknown) keep the HOF path.
    band_fn = (embedding_band_values_np
               if n is not None and n * n_planes > 10_000_000
               else embedding_band_values)
    exploded = band_fn(emb, planes, bits_per_band).persist()
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .distinct()
    )
    va = emb.select(F.col("id").alias("vec_a"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"))
    vb = emb.select(F.col("id").alias("vec_b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"))
    return (
        cand.join(va, "vec_a").join(vb, "vec_b")
        .withColumn("cos", cosine(F.col("va"), F.col("na"),
                                  F.col("vb"), F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )


def duplicated_spans(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact duplicated-substring detection, Lee et al. 2021 style
    ("Deduplicating Training Data Makes Language Models Better"):
    per document, the maximal word spans whose every k-word window
    also occurs elsewhere in the corpus (another document OR another
    position in the same one). Output per doc with any duplication:
    (doc_id, n_spans, dup_tokens, total_tokens, dup_ratio).

    Spark-first, no UDFs anywhere:
    1. positioned k-word shingles (sequence/transform/explode);
    2. a global occurrence count as ONE window over the shingle
       string — the only corpus-wide exchange (the paper's suffix
       array re-expressed as an equi-partition on the window text);
    3. gaps-and-islands span merge per doc: running max(p + k - 1)
       over preceding rows, new island when p breaks contiguity —
       two narrow window passes over only the duplicated positions.

    The occurrence window is keyed on ``xxhash64`` of the window text
    (8-byte shuffle keys; the string never leaves the map side — see
    the measured superlinear-tail fix in ``_dup_positions``); the
    DuckDB oracle (DEDUP_SUBSTRING_SQL) groups by the exact string
    and still value-matches because the compare is on output spans.

    Plan trap (measured 7-9 s → 0.65 s warm at sf0.1, same session
    A/B): the obvious shingle construction — ``transform(sequence(1,
    tot-k+1), i -> array_join(slice(w, i, k)))`` + explode — runs
    10-15× slower than these flat expressions in most JVMs (the
    nested higher-order-function Generate produces one huge codegen
    method that HotSpot often refuses to JIT; the slowdown is
    bimodal across sessions — measured, not theorized). Shingles are
    therefore built flat: posexplode the words once, then k-1
    ``lead()``s + concat_ws over the (doc_id, p) window — whose sort
    the island windows below reuse.
    """
    dup = _dup_positions(docs, k, id_col, text_col).drop("rn")
    spans = _merge_islands(dup, k)
    return (
        spans.groupBy("doc_id", "tot")
        .agg(F.count(F.lit(1)).alias("n_spans"),
             F.sum(F.col("en") - F.col("st") + 1).alias("dup_tokens"))
        .select(
            "doc_id",
            "n_spans",
            "dup_tokens",
            F.col("tot").cast("long").alias("total_tokens"),
            F.round(F.col("dup_tokens") / F.col("tot"), 4).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


def _positioned_tokens(docs: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """(doc_id, tot, p, t): every word of every doc with its 1-based
    position — the shared explode the shingle stage and the
    text-rebuild stage both start from."""
    toks = _spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("w")
    ).select("doc_id", "w", F.size("w").alias("tot"))
    return toks.select(
        "doc_id", "tot", F.posexplode("w").alias("p0", "t")
    ).select("doc_id", "tot", (F.col("p0") + 1).alias("p"), "t")


def _dup_positions(docs: DataFrame, k: int, id_col: str,
                   text_col: str) -> DataFrame:
    """(doc_id, tot, p, rn) for every k-shingle position whose window
    text occurs more than once in the corpus; ``rn`` is the
    occurrence's 1-based rank in (doc_id, p) order — rank 1 is the
    canonical (kept-first) occurrence."""
    from pyspark.sql import Window

    tok1 = _positioned_tokens(docs, id_col, text_col)
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    gram = F.concat_ws(
        " ", F.col("t"),
        *[F.lead("t", j).over(wdoc) for j in range(1, k)])
    # the occurrence window shuffles/sorts on xxhash64(window text),
    # not the text itself: the ~50-byte shingle string never leaves
    # the map side (8-byte keys instead), which removed the measured
    # superlinear tail past 500k docs (x100→x300 marginal exponent
    # 1.55 → 0.67 after this change; BASELINE_LOCAL r11). A 2^-64
    # hash collision admits a false duplicate position — the same
    # trade Lee et al.'s MinHash stage makes, and the DuckDB oracle
    # (which groups by the exact string) still value-matches because
    # the comparison is on the OUTPUT spans.
    occ = (
        tok1.withColumn("h", F.xxhash64(gram))
        .filter(F.col("p") <= F.col("tot") - (k - 1))
        .select("doc_id", "tot", "p", "h")
    )
    ws = Window.partitionBy("h")
    return (
        occ.withColumn("c", F.count("*").over(ws))
        .withColumn("rn", F.row_number().over(ws.orderBy("doc_id", "p")))
        .filter(F.col("c") > 1)
        .drop("h", "c")
    )


def _merge_islands(positions: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands over (doc_id, tot, p) rows: each position
    covers words [p, p+k-1]; overlapping/adjacent intervals merge.
    Returns (doc_id, tot, island, st, en)."""
    from pyspark.sql import Window

    prev_end = F.max(F.col("p") + (k - 1)).over(
        Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1))
    marked = positions.withColumn(
        "is_new",
        (F.col("p") > F.coalesce(prev_end, F.lit(-1)) + 1).cast("int"))
    islands = marked.withColumn(
        "island",
        F.sum("is_new").over(Window.partitionBy("doc_id").orderBy("p")))
    return islands.groupBy("doc_id", "tot", "island").agg(
        F.min("p").alias("st"), F.max(F.col("p") + (k - 1)).alias("en"))


def remove_duplicated_spans(docs: DataFrame, k: int = 8,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            strategy: str = "array") -> DataFrame:
    """The repair half of Lee-et-al substring dedup: every NON-FIRST
    occurrence of a duplicated k-word window is removed and the doc
    text rebuilt from the surviving words — the first occurrence
    (lowest (doc_id, position)) keeps the text, so for duplicates
    that repeat at non-overlapping positions exactly one copy
    survives the corpus. Caveat for SELF-OVERLAPPING repeats with
    period < k (e.g. a run of 10 'a' tokens, k=8): the rank>1
    occurrence positions start INSIDE the rank-1 occurrence's span,
    so the merged removal island [2, 10] swallows most of the
    canonical first copy too and the run collapses to the single
    uncovered token 'a' — no full k-word copy survives. The invariant
    the pass guarantees is therefore "the cleaned corpus contains no
    duplicated k-window", not "one copy of every duplicated substring
    survives". Output one
    row per input doc: (doc_id, clean_text, removed_tokens, total_tokens)
    — a doc that is entirely duplicated material comes back with
    clean_text '' (drop it downstream), a doc with no duplication
    comes back with its normalized text intact.

    Detection is the duplicated_spans skeleton; the repair differs by
    ``strategy``:

    - ``"array"`` (default, the r12 plan): merged spans aggregate to
      ONE (doc_id, array<struct<st,en>>) row per affected doc — the
      detection pass's own output, orders of magnitude smaller than
      the corpus — and join back at DOCUMENT level; covered words
      drop in-place via a positional higher-order ``filter`` over the
      words array (per-word cost O(spans-in-doc), and spans per doc
      is tiny by construction — adjacent/overlapping ones merged).
      The corpus crosses ONE exchange at document granularity.
    - ``"join"`` (the r11 plan, kept for the measured A/B and the
      parity lock in tests): explode covered positions and left_anti
      join the positioned-token explode by (doc_id, p), then rebuild
      with sort_array(collect_list) — which shuffles the corpus TWICE
      at TOKEN granularity (the join and the collect_list agg, whose
      partial aggregation cannot reduce). Measured A/B (BASELINE_LOCAL
      r12): array beats join 1.18x at sf0.1 (2.40 vs 2.83 s) and
      1.6-1.7x on the fresh-JVM ladder (x100 9.28 vs 14.88 s, x300
      26.5 vs 44.4 s)."""
    removable = _dup_positions(docs, k, id_col, text_col).filter(
        F.col("rn") > 1).drop("rn")
    spans = _merge_islands(removable, k)
    if strategy == "join":
        tok1 = _positioned_tokens(docs, id_col, text_col)
        covered = spans.select(
            "doc_id", F.explode(F.sequence("st", "en")).alias("p"))
        kept = tok1.join(covered, ["doc_id", "p"], "left_anti")
        rebuilt = kept.groupBy("doc_id", "tot").agg(
            F.count(F.lit(1)).alias("kept_n"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("p", "t"))),
                            lambda x: x["t"]), " ").alias("clean_text"),
        )
        base = tok1.groupBy("doc_id", "tot").count().drop("count")
        return (
            base.join(rebuilt, ["doc_id", "tot"], "left")
            .select(
                "doc_id",
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                (F.col("tot") - F.coalesce("kept_n", F.lit(0)))
                .cast("long").alias("removed_tokens"),
                F.col("tot").cast("long").alias("total_tokens"),
            )
            .orderBy("doc_id")
        )
    if strategy != "array":
        raise ValueError(f"strategy must be 'array' or 'join', got {strategy!r}")
    span_arrays = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("st", "en")).alias("_spans"))
    base = _spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("w"))
    joined = base.join(span_arrays, "doc_id", "left")
    # positional filter: word index i is 0-based, span bounds 1-based
    kept_w = F.filter(
        "w",
        lambda t, i: ~F.exists(
            "_spans",
            lambda s: (i + 1 >= s["st"]) & (i + 1 <= s["en"])),
    )
    clean = F.when(F.col("_spans").isNull(), F.col("w")).otherwise(kept_w)
    return (
        joined.select(
            "doc_id",
            F.array_join(clean, " ").alias("clean_text"),
            (F.size("w") - F.size(clean)).cast("long").alias("removed_tokens"),
            F.size("w").cast("long").alias("total_tokens"),
        )
        .orderBy("doc_id")
    )
