"""Portable histogram-quantile sketch: error bound vs exact
percentiles, merge exactness, and degenerate-group handling. The
registry entry's DuckDB value compare runs via tests/test_oracle.py
and the driver gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from last_minute_legends_spark.operators.sketches import (
    HIST_BINS,
    hist_bins,
    hist_merge,
    hist_quantile,
    hist_quantiles,
    hist_stats,
)
from last_minute_legends_spark.plans.events_analytics import (
    events_hist_quantile,
)
from last_minute_legends_spark.sources.tables import Catalog

QS = {"p50": 0.5, "p95": 0.95, "p99": 0.99}


def test_hist_error_bound(spark, sf_dir):
    """The estimate lands in the same bin as the DISCRETE percentile
    (the data value at rank ⌈q·n⌉), so their distance is bounded by
    one bin width. (The bound is stated against the discrete
    percentile deliberately: an INTERPOLATED percentile in a sparse
    tail sits between data values that can be many empty bins apart,
    which no histogram estimator can bound.)"""
    import math

    ev = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    est = {r["event_type"]: r for r in
           events_hist_quantile(spark, sf_dir).collect()}
    vals: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(est) == set(vals)
    for t, vs in vals.items():
        vs.sort()
        width = (vs[-1] - vs[0]) / HIST_BINS
        for name, q in QS.items():
            discrete = vs[math.ceil(q * len(vs)) - 1]
            # slack = half-ULP of the estimate's round(4) (5e-5), which
            # dominates FP noise; 1e-6 alone would spuriously fail a
            # group whose bin width is under ~5e-5
            assert abs(est[t][name] - discrete) <= width + 5e-5, (
                t, name, est[t][name], discrete, width)


def test_hist_merge(spark):
    """Bin frames built on disjoint halves against SHARED stats merge
    into exactly the single-shot sketch — the epoch-maintenance
    property (fixed edges are what make the counts sum-mergeable)."""
    whole = spark.range(1000).select(
        F.lit("g").alias("g"), (F.col("id") % 97 * 1.5).alias("v"))
    a = whole.filter(F.col("id") < 400)
    b = whole.filter(F.col("id") >= 400)
    stats = hist_stats(whole, F.col("v"), ["g"])
    merged = hist_quantiles(
        hist_merge(
            hist_bins(a, F.col("v"), ["g"], stats).unionByName(
                hist_bins(b, F.col("v"), ["g"], stats)), ["g"]),
        stats, ["g"], QS).collect()
    single = hist_quantile(whole, F.col("v"), ["g"], QS).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in single]


def test_incremental_quantile_equals_single_shot(spark, sf_dir):
    """The two-sweep epoch refresh (fold stats to fix edges, then
    fold bins) must estimate EXACTLY like one single-shot build over
    the same landed table — Spark-vs-Spark, so a landing/fold bug is
    distinguishable from an oracle bug (the registered oracle checks
    the same equality vs DuckDB on the base table)."""
    from last_minute_legends_spark.plans.events_analytics import (
        incremental_quantile,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        land_events_partitioned,
    )

    maintained = incremental_quantile(spark, sf_dir).collect()
    landed = (spark.read.parquet(land_events_partitioned(spark, sf_dir))
              .filter(F.col("event_day_us").isNotNull()))
    single = hist_quantile(
        landed, F.col("value"), ["event_day_us"],
        {"p50": 0.5, "p95": 0.95, "p99": 0.99},
    ).orderBy("event_day_us").collect()
    assert [tuple(r) for r in maintained] == [tuple(r) for r in single]


def test_hist_properties(spark):
    """Property lock on hypothesis-random value multisets: (a) the
    merge law — bin frames from ANY two batches against shared stats
    fold into exactly the single-shot sketch; (b) the error bound —
    every estimated quantile is within one bin width (+ round(4)
    quantization) of the discrete value-at-rank percentile."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=150)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(a=vals, b=vals)
    def check(a, b):
        fa = spark.createDataFrame([(v,) for v in a], "v double").select(
            F.lit("g").alias("g"), "v")
        fb = spark.createDataFrame([(v,) for v in b], "v double").select(
            F.lit("g").alias("g"), "v")
        whole = fa.unionAll(fb)
        stats = hist_stats(whole, F.col("v"), ["g"])
        merged = hist_quantiles(
            hist_merge(
                hist_bins(fa, F.col("v"), ["g"], stats).unionByName(
                    hist_bins(fb, F.col("v"), ["g"], stats)), ["g"]),
            stats, ["g"], QS).collect()
        single = hist_quantile(whole, F.col("v"), ["g"], QS).collect()
        assert [tuple(r) for r in merged] == [tuple(r) for r in single]

        vs = sorted(a + b)
        width = (vs[-1] - vs[0]) / HIST_BINS
        for name, q in QS.items():
            discrete = vs[math.ceil(q * len(vs)) - 1]
            assert abs(single[0][name] - discrete) <= width + 5e-5 + \
                abs(width) * 1e-6, (name, single[0][name], discrete, width)

    check()


def test_hist_degenerate_group(spark):
    """A single-valued group (mx == mn) reports that value for every
    quantile instead of dividing by a zero-width bin."""
    df = spark.range(10).select(
        F.lit("g").alias("g"), F.lit(7.5).alias("v"))
    row = hist_quantile(df, F.col("v"), ["g"], QS).collect()[0]
    assert (row["p50"], row["p95"], row["p99"]) == (7.5, 7.5, 7.5)
    assert row["n_events"] == 10
