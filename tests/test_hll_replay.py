"""Portable-HLL replay twin: cross-engine value identity, accuracy
vs the exact answer and the native HLL++, estimator-branch coverage,
and the mergeability property that makes the sketch incremental.

The registry entry (``events_hll_replay``) gets the full driver-side
DuckDB value compare via plans/queries.py; here the same compare runs
locally plus the properties no single hash compare can express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from last_minute_legends_spark.operators.sketches import (
    HLL_M,
    _SMALL_RANGE,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from last_minute_legends_spark.plans.events_analytics import (
    EVENTS_HLL_REPLAY_SQL,
    events_hll_replay,
)
from last_minute_legends_spark.sources.tables import Catalog
from tests.oracle import compare, run_oracle


def test_hll_replay_matches_oracle(spark, sf_dir):
    sdf = events_hll_replay(spark, sf_dir)
    odf = run_oracle(EVENTS_HLL_REPLAY_SQL, sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "\n".join(issues)


def test_hll_error_bound(spark, sf_dir):
    """Estimate within 3 standard errors (raw branch se ~= 1.04/sqrt(m)
    ~= 6.5%; the linear-counting branch active at small n is tighter,
    so 3*se is a safe common bound) of the exact distinct count, per
    group."""
    ev = Catalog(spark, sf_dir).events
    est = {r["event_type"]: r["approx_users"]
           for r in events_hll_replay(spark, sf_dir).collect()}
    exact = {r["event_type"]: r["exact"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact")).collect()}
    assert set(est) == set(exact)
    for k, e in exact.items():
        rel = abs(est[k] - e) / max(e, 1)
        assert rel < 3 * 1.04 / (HLL_M ** 0.5), (k, est[k], e, rel)


def test_hll_both_branches(spark):
    """Synthetic cardinalities on each side of the 2.5m small-range
    threshold land in the intended estimator branch and stay
    accurate: n=40 must take linear counting (estimate for n << m is
    near-exact), n=4000 >> 2.5m must take the raw harmonic path."""
    small = spark.range(40).select(
        F.lit("a").alias("g"), F.col("id").alias("k"))
    est_small = hll_distinct(small, F.col("k"), ["g"]).collect()[0]
    assert est_small["approx_users"] < _SMALL_RANGE  # consistent w/ branch
    assert abs(est_small["approx_users"] - 40) / 40 < 0.10

    big = spark.range(4000).select(
        F.lit("a").alias("g"), F.col("id").alias("k"))
    est_big = hll_distinct(big, F.col("k"), ["g"]).collect()[0]
    assert est_big["approx_users"] > _SMALL_RANGE
    assert abs(est_big["approx_users"] - 4000) / 4000 < 0.20


def test_hll_merge(spark):
    """merge(regs(A) ∪ regs(B)) estimates EXACTLY like regs(A ∪ B) —
    including overlapping keys, the case where naive count-summing
    breaks. This is the incremental-maintenance property: per-epoch
    register frames fold into the running sketch without rescanning
    history."""
    a = spark.range(0, 600).select(F.lit("g").alias("g"),
                                   F.col("id").alias("k"))
    b = spark.range(300, 900).select(F.lit("g").alias("g"),
                                     F.col("id").alias("k"))
    whole = hll_distinct(a.unionAll(b), F.col("k"), ["g"]).collect()
    merged = hll_estimate(
        hll_merge(hll_registers(a, F.col("k"), ["g"]).unionAll(
            hll_registers(b, F.col("k"), ["g"])), ["g"]),
        ["g"],
    ).collect()
    assert [tuple(r) for r in whole] == [tuple(r) for r in merged]
    # and n_events still counts ROWS folded in (1200), while the
    # estimate tracks DISTINCT keys (900)
    assert merged[0]["n_events"] == 1200
    assert abs(merged[0]["approx_users"] - 900) / 900 < 0.20


def test_incremental_distinct_equals_single_shot(spark, sf_dir):
    """The epoch-maintained registers must estimate EXACTLY like one
    single-shot build over the same landed table — the property the
    registered oracle also checks (vs DuckDB on the base table), here
    asserted Spark-vs-Spark so a landing/fold bug is distinguishable
    from a codec/oracle bug."""
    from last_minute_legends_spark.plans.events_analytics import (
        incremental_distinct,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        land_events_partitioned,
    )

    maintained = incremental_distinct(spark, sf_dir).collect()
    landed = spark.read.parquet(land_events_partitioned(spark, sf_dir))
    single = (
        hll_distinct(landed.filter(F.col("event_day_us").isNotNull()),
                     F.col("user_id"), ["event_day_us"])
        .orderBy("event_day_us").collect()
    )
    assert [tuple(r) for r in maintained] == [tuple(r) for r in single]


def test_hll_merge_property(spark):
    """Property lock for the merge law on hypothesis-random key
    multisets: for ANY two batches (overlapping, duplicated, empty-B
    allowed), folding their register frames estimates exactly like
    one pass over the union — the algebra incremental_distinct's
    epoch fold rests on, checked beyond the single crafted case."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=0, max_size=200)

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(a=keys.filter(lambda x: len(x) > 0), b=keys)
    def check(a, b):
        fa = spark.createDataFrame([(k,) for k in a], "k long").select(
            F.lit("g").alias("g"), "k")
        rows_b = [(k,) for k in b]
        fb = spark.createDataFrame(rows_b or [(0,)], "k long").select(
            F.lit("g").alias("g"), "k")
        if not rows_b:
            fb = fb.filter(F.lit(False))
        whole = hll_distinct(fa.unionAll(fb), F.col("k"), ["g"]).collect()
        merged = hll_estimate(
            hll_merge(hll_registers(fa, F.col("k"), ["g"]).unionAll(
                hll_registers(fb, F.col("k"), ["g"])), ["g"]),
            ["g"]).collect()
        assert [tuple(r) for r in whole] == [tuple(r) for r in merged]

    check()


def test_hll_vs_native(spark, sf_dir):
    """The portable estimator agrees with Spark's native HLL++ to
    within the sum of their error budgets — ties the replay twin to
    the production sketch (events_sketches) it stands in for."""
    ev = Catalog(spark, sf_dir).events
    native = {r["event_type"]: r["native"]
              for r in ev.groupBy("event_type").agg(
                  F.approx_count_distinct("user_id", rsd=0.02)
                  .alias("native")).collect()}
    portable = {r["event_type"]: r["approx_users"]
                for r in events_hll_replay(spark, sf_dir).collect()}
    for k in native:
        rel = abs(portable[k] - native[k]) / max(native[k], 1)
        assert rel < 0.25, (k, portable[k], native[k])
