"""Event-stream analytics (SURVEY §2.2) — the reference's consumer
segmentation surface (user-activity events → sessions, funnels, RFM
segments, pivots) re-expressed as batch DataFrame plans over the
driver ``events`` table. Streaming variants live in plans/stream_q.py.

Reference context: event model /root/reference/UserEvents.py:59-162
(sign_in/item_view/added_to_cart/checkout ≙ event_type values here);
incremental publish diff /root/reference/services/spark_batch_processor.py:83-102;
price parsing :50-66.

Determinism conventions: timestamps exported as epoch microseconds
(exact integers both engines); session gap math in truncated epoch
seconds, identical in Spark (`cast("long")`) and DuckDB
(`epoch_us(ts)//1000000`); window orderings always tiebroken by
event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.prices import (
    compose_price_string,
    extract_trailing_price,
)
from last_minute_legends_spark.operators.asof import asof_join
from last_minute_legends_spark.operators.funnel import funnel_counts
from last_minute_legends_spark.operators.incremental import new_records
from last_minute_legends_spark.operators.segmentation import rfm_segments
from last_minute_legends_spark.operators.sessions import sessionize
from last_minute_legends_spark.sources.tables import Catalog

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# --- events_by_type -----------------------------------------------------

def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("event_type")
    )


EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(avg(value), 4) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- events_windowed: 1-hour tumbling windows ---------------------------

def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type", "n_events", "sum_value",
        )
        .orderBy("window_start_us", "event_type")
    )


EVENTS_WINDOWED_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start_us, event_type
"""


# --- sessionization: 30-min-gap sessions --------------------------------

def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    s = sessionize(ev, gap_minutes=30)
    return (
        s.groupBy("user_id", F.col("session_id").alias("session_seq"))
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_seq")
    )


SESSIONIZATION_SQL = """
WITH x AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) // 1000000
                     - epoch_us(lag(ts) OVER w) // 1000000 > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM x
)
SELECT user_id, session_seq,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# --- funnel: view → click → purchase ------------------------------------

def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return funnel_counts(ev, ["view", "click", "purchase"])


FUNNEL_SQL = """
WITH u AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
    FROM events GROUP BY user_id
)
SELECT count(CASE WHEN t0 IS NOT NULL THEN 1 END) AS n_view,
       count(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
                  THEN 1 END) AS n_click,
       count(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
                   AND t2 IS NOT NULL AND t2 >= t1 THEN 1 END) AS n_purchase
FROM u
"""


# --- user_segmentation: RFM ---------------------------------------------

def user_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    seg = rfm_segments(ev, as_of="2024-02-01", freq_hi=15, monetary_hi=1500.0)
    return seg.select(
        "user_id",
        F.col("recency_days").cast("long").alias("recency_days"),
        "frequency", "monetary", "segment",
    ).orderBy("user_id")


USER_SEGMENTATION_SQL = """
SELECT user_id,
       date_diff('day', CAST(max(ts) AS DATE), DATE '2024-02-01') AS recency_days,
       count(*) AS frequency,
       round(sum(value), 2) AS monetary,
       CASE WHEN count(*) >= 15 AND round(sum(value), 2) >= 1500.0 THEN 'champion'
            WHEN count(*) >= 15 THEN 'loyal'
            WHEN round(sum(value), 2) >= 1500.0 THEN 'big_spender'
            WHEN date_diff('day', CAST(max(ts) AS DATE), DATE '2024-02-01') <= 7
                 THEN 'recent'
            ELSE 'standard' END AS segment
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
"""


# --- user_pivot: per-user event-type count matrix -----------------------

def user_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    p = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count().na.fill(0)
    for t in EVENT_TYPES:
        p = p.withColumnRenamed(t, f"n_{t}")
    return p.orderBy("user_id")


USER_PIVOT_SQL = """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- json_props: JSON field extraction ----------------------------------

def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


JSON_PROPS_SQL = """
SELECT event_type, count(*) AS n_events,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- new_records: incremental anti-join diff ----------------------------

def new_records_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    candidates = orders.filter(F.col("o_orderdate") >= "1999-01-01").select(
        "o_orderkey", "o_custkey"
    )
    published = orders.filter(F.col("o_orderdate") < "1999-01-01")
    return new_records(candidates, published, key="o_custkey").orderBy("o_orderkey")


NEW_RECORDS_SQL = """
SELECT o_orderkey, o_custkey
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  AND NOT EXISTS (SELECT 1 FROM orders p
                  WHERE p.o_orderdate < TIMESTAMP '1999-01-01'
                    AND p.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""


# --- price_extraction ---------------------------------------------------

def price_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = Catalog(spark, sf_dir).part
    composed = part.select(
        "p_partkey",
        compose_price_string(F.col("p_retailprice")).alias("price_str"),
    )
    return composed.select(
        "p_partkey",
        F.round(extract_trailing_price(F.col("price_str")), 2).alias("price_usd"),
    ).orderBy("p_partkey")


PRICE_EXTRACTION_SQL = """
SELECT p_partkey,
       round(CAST(regexp_extract(
           CAST(CAST(round(p_retailprice * 100, 0) AS BIGINT) AS VARCHAR)
               || 'USD$' || CAST(p_retailprice AS VARCHAR),
           '\\$(.+)$', 1) AS DOUBLE), 2) AS price_usd
FROM part ORDER BY p_partkey
"""


# --- asof_join: purchase → most recent prior view -----------------------

def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER as-of: every purchase gets the latest prior view's
    timestamp, and purchases with NO prior view survive with a null
    ``last_view_us`` — the union-sort formulation (operators/asof.py)
    is structurally outer (an anchor row is never filtered; its
    carried-forward value is simply null when no right row precedes
    it), and the registered oracle is the corresponding LEFT JOIN, so
    the null rows are value-checked at the gate (155 of 1981 rows at
    sf0.01). Misses-included is what real funnel analyses need;
    tests/test_operators.py locks that unmatched anchors survive."""
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["view_ts"],
    )
    return joined.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("view_ts_asof").alias("last_view_us"),
    ).orderBy("event_id")


ASOF_JOIN_SQL = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(max(v.ts)) AS last_view_us
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY p.event_id
"""


# --- range_join: views within 1 hour before each purchase ---------------

def range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.count("v_id").alias("n_views_1h"))
        .orderBy("event_id")
    )


RANGE_JOIN_SQL = """
SELECT p.event_id, p.user_id, count(v.event_id) AS n_views_1h
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""


# --- events_quantiles: exact percentiles per event type ------------------

def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of value per event type. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear
    interpolation definition, so values hash-match at 4 dp. At scale
    exact percentiles sort within groups — swap to
    ``percentile_approx`` (t-digest) when a bounded error is fine."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.max("value"), 4).alias("v_max"),
        )
        .orderBy("event_type")
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- moving_avg: sliding row-frame window per user ------------------------

def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-row moving average of purchase values (ROWS BETWEEN
    4 PRECEDING AND CURRENT ROW), deterministic order (ts, event_id).
    One shuffle on user_id shared by the window; the frame is
    incremental per row — no per-row rescans."""
    ev = Catalog(spark, sf_dir).events.filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return (
        ev.select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.round(F.avg("value").over(w), 4).alias("avg_5"),
            F.count(F.lit(1)).over(w).alias("n_window"),
        )
        .orderBy("event_id")
    )


MOVING_AVG_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(avg(value) OVER w, 4) AS avg_5,
       count(*) OVER w AS n_window
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# --- events_sketches: HLL + t-digest approximate aggregates ---------------

def events_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the 100 TB answer when exact distinct
    counts / percentiles are too expensive: HyperLogLog++ distinct
    users (approx_count_distinct, ~2% standard error, constant memory)
    and an approximate p95 (positional quantile summary, 1e4 accuracy).
    Rows-only checked (sketches are estimate-valued by design); the
    error bound vs the exact answers is asserted in
    tests/test_operators.py::test_sketches_error_bounds."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def events_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events_sketches``' distinct-count half with a PORTABLE
    HyperLogLog (operators/sketches.py) in place of the native HLL++
    black box: md5-prefix hash → 256 registers → max-rank →
    harmonic-mean estimate with the Flajolet linear-counting
    small-range branch. Same scale shape as the native sketch (two
    partial-aggregatable shuffles, per-group state capped at m
    registers, registers sum-mergeable across epochs) but every
    arithmetic step replays bit-for-bit in the driver's DuckDB gate —
    the sketch family's first driver-side VALUE check (r12/r13
    replay-twin pattern). Both estimator branches are exercised by
    the test corpora: sf0.01 lands in linear counting (n=150 < 2.5m),
    sf0.1 in the raw harmonic branch (n=1500). Accuracy vs
    the exact distinct and vs native approx_count_distinct is
    asserted in tests/test_hll_replay.py."""
    from last_minute_legends_spark.operators.sketches import hll_distinct

    ev = Catalog(spark, sf_dir).events
    return hll_distinct(ev, F.col("user_id"), ["event_type"]).orderBy(
        "event_type")


def _hll_sql(group_expr: str, group_alias: str, where: str = "") -> str:
    """From-scratch DuckDB replay of the portable HLL over ``events``
    grouped by ``group_expr``: identical hash, register math,
    exact-integer harmonic denominator, and branch condition as
    operators/sketches.py. Shared by the single-shot replay twin and
    the incrementally-maintained variant — whose oracle being the
    SINGLE-SHOT derivation is exactly what makes a broken merge or a
    missed epoch a value mismatch."""
    from last_minute_legends_spark.operators.sketches import (
        HLL_M, _EST_NUMER, _MAX_RHO, _RANK_BITS, _RANK_MASK, _SMALL_RANGE,
    )
    from last_minute_legends_spark.functions.portable_hash import duck_hash60

    h = duck_hash60("user_id::VARCHAR")
    scale = 1 << _MAX_RHO
    # NULL keys are dropped on both engines (hll_registers' explicit
    # NULL-key policy — count(DISTINCT) semantics)
    where = (where + " AND " if where else "WHERE ") + "user_id IS NOT NULL"
    return f"""
WITH h AS (
    SELECT {group_expr} AS {group_alias}, {h} AS h FROM events {where}
), rr AS (
    SELECT {group_alias}, h >> {_RANK_BITS} AS reg,
           CASE WHEN (h & {_RANK_MASK}) = 0 THEN {_MAX_RHO}
                ELSE {_MAX_RHO} - length(bin(h & {_RANK_MASK})) END AS rho
    FROM h
), regs AS (
    SELECT {group_alias}, reg, max(rho) AS mj, count(*) AS n
    FROM rr GROUP BY 1, 2
), pt AS (
    SELECT {group_alias},
           sum(CAST(power(2, {_MAX_RHO} - mj) AS BIGINT)) AS s_scaled,
           count(*) AS nreg, sum(n) AS n_events
    FROM regs GROUP BY 1
)
SELECT {group_alias},
       round(CASE WHEN ({_EST_NUMER!r}::DOUBLE) / (s_scaled + ({HLL_M} - nreg) * {scale}) <= ({_SMALL_RANGE!r}::DOUBLE)
                   AND nreg < {HLL_M}
              THEN ({float(HLL_M)!r}::DOUBLE) * ln(({float(HLL_M)!r}::DOUBLE) / ({HLL_M} - nreg))
              ELSE ({_EST_NUMER!r}::DOUBLE) / (s_scaled + ({HLL_M} - nreg) * {scale}) END,
             4) AS approx_users,
       CAST(n_events AS BIGINT) AS n_events
FROM pt
ORDER BY {group_alias}
"""


EVENTS_HLL_REPLAY_SQL = _hll_sql("event_type", "event_type")


def events_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUANTILE half of the sketch story made replayable:
    ``events_sketches``' p95 uses percentile_approx, a positional
    summary no second engine reproduces — this twin estimates
    p50/p95/p99 of ``value`` per event type with a portable
    equi-width-histogram sketch (operators/sketches.py): exact
    per-group (min, max, count) fixes the bin edges, a second
    partial-aggregatable pass counts HIST_BINS bins per group,
    quantiles interpolate uniform-within-bin. Per-group state is
    m-bounded and the bin counts sum-merge across epochs against
    fixed edges (merge exactness + the one-bin-width error bound vs
    the discrete value-at-rank percentile are locked in
    tests/test_hist_quantile.py).
    Every arithmetic step replays in the DuckDB gate."""
    from last_minute_legends_spark.operators.sketches import hist_quantile

    ev = Catalog(spark, sf_dir).events
    return hist_quantile(
        ev, F.col("value"), ["event_type"],
        qs={"p50": 0.5, "p95": 0.95, "p99": 0.99},
    ).orderBy("event_type")


def _hist_quantile_sql(group_expr: str = "event_type",
                       group_alias: str = "event_type",
                       where: str = "") -> str:
    """From-scratch DuckDB replay of the histogram-quantile pipeline
    over ``events`` grouped by ``group_expr``. Numeric literals are
    forced to DOUBLE (DuckDB parses bare decimal literals as DECIMAL,
    whose arithmetic would diverge from Spark's doubles). Shared by
    the single-shot twin and the epoch-maintained variant — the
    latter's oracle being the single-shot derivation is what makes a
    broken fold a value mismatch."""
    from last_minute_legends_spark.operators.sketches import HIST_BINS

    where = (where + " AND " if where else "WHERE ") + "value IS NOT NULL"
    nb = f"({float(HIST_BINS)!r}::DOUBLE)"
    picks = []
    for name, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        t = f"({q!r}::DOUBLE) * n"
        picks.append(
            f"""round(min(CASE WHEN prev < {t} AND cum >= {t} THEN
                 CASE WHEN mx = mn THEN mn
                      ELSE mn + (bin + ({t} - prev) / cnt) * ((mx - mn) / {nb})
                 END END), 4) AS {name}"""
        )
    pick_sql = ",\n       ".join(picks)
    return f"""
WITH v AS (
    SELECT {group_expr} AS {group_alias}, value FROM events {where}
), st AS (
    SELECT {group_alias}, min(value) AS mn, max(value) AS mx, count(*) AS n
    FROM v GROUP BY 1
), b AS (
    SELECT v.{group_alias},
           CASE WHEN mx = mn THEN 0
                ELSE least({HIST_BINS - 1},
                           CAST(floor((value - mn) / (mx - mn) * {nb}) AS INT))
           END AS bin,
           count(*) AS cnt
    FROM v JOIN st USING ({group_alias}) GROUP BY 1, 2
), r AS (
    SELECT b.{group_alias}, bin, cnt, mn, mx, n,
           sum(cnt) OVER (PARTITION BY b.{group_alias} ORDER BY bin) AS cum
    FROM b JOIN st USING ({group_alias})
), rr AS (
    SELECT *, cum - cnt AS prev FROM r
)
SELECT {group_alias},
       {pick_sql},
       CAST(max(n) AS BIGINT) AS n_events
FROM rr
GROUP BY {group_alias}
ORDER BY {group_alias}
"""


EVENTS_HIST_QUANTILE_SQL = _hist_quantile_sql()


# --- rollup_timeseries: multi-resolution continuous aggregate -------------

def rollup_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: hour AND day resolutions in ONE pass
    via GROUPING SETS over pre-computed time buckets (one shuffle with
    map-side partial aggregation — not two scans + union). The
    resolution of each output row is explicit ('hour'/'day'), bucket
    exported as epoch micros."""
    ev = Catalog(spark, sf_dir).events
    bucketed = ev.select(
        "event_type", "value",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bucket_hour_us"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("bucket_day_us"),
    )
    agged = (
        bucketed.groupingSets(
            [["bucket_hour_us", "event_type"], ["bucket_day_us", "event_type"]],
            "bucket_hour_us", "bucket_day_us", "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    return (
        agged.select(
            F.when(F.col("bucket_hour_us").isNotNull(), F.lit("hour"))
            .otherwise(F.lit("day")).alias("resolution"),
            F.coalesce("bucket_hour_us", "bucket_day_us").alias("bucket_us"),
            "event_type", "n_events", "sum_value",
        )
        .orderBy("resolution", "bucket_us", "event_type")
    )


ROLLUP_TIMESERIES_SQL = """
WITH bucketed AS (
    SELECT event_type, value,
           epoch_us(date_trunc('hour', ts)) AS bucket_hour_us,
           epoch_us(date_trunc('day', ts))  AS bucket_day_us
    FROM events
), agged AS (
    SELECT bucket_hour_us, bucket_day_us, event_type,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM bucketed
    GROUP BY GROUPING SETS ((bucket_hour_us, event_type),
                            (bucket_day_us, event_type))
)
SELECT CASE WHEN bucket_hour_us IS NOT NULL THEN 'hour' ELSE 'day' END AS resolution,
       COALESCE(bucket_hour_us, bucket_day_us) AS bucket_us,
       event_type, n_events, sum_value
FROM agged
ORDER BY resolution, bucket_us, event_type
"""


# --- latest_by_user: CDC-style "current state" extraction ----------------

def latest_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the keep-newest upsert a CDC/merge sink
    performs, as one window (shuffle on user_id, tiebreak event_id
    desc so replays are deterministic)."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id",
                F.unix_micros("ts").alias("ts_us"), "event_type",
                F.round("value", 2).alias("value"))
        .orderBy("user_id")
    )


LATEST_BY_USER_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
       round(value, 2) AS value
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


def skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join (operators/skew.py): events x customer on
    user_id with an 8-way salt so no single reducer ever owns a hot
    key. The oracle is the PLAIN equi-join — salting must be
    row-identical to it, and the local value check proves exactly
    that on real tables (the planted-skew unit test covers the hot
    key path)."""
    from last_minute_legends_spark.operators.skew import salted_join

    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("event_id", "user_id", "event_type",
                           F.round("value", 2).alias("value"))
    cust = cat.customer.select(F.col("c_custkey").alias("user_id"),
                               "c_name", "c_nationkey")
    return (
        salted_join(ev, cust, "user_id", "event_id", salt_n=8)
        .select("event_id", "user_id", "event_type", "value",
                "c_name", "c_nationkey")
        .orderBy("event_id")
    )


SKEW_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.event_type, round(e.value, 2) AS value,
       c.c_name, c.c_nationkey
FROM events e JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
"""


def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join reduction
    (operators/runtime_filter.py): events ⋈ a SELECTIVELY-filtered
    customer dim (one nation) in the shuffle-join regime — the dim's
    join keys build a ``bloom_filter_agg`` and a ``might_contain``
    predicate lands on the fact side BELOW its exchange, so
    non-matching events die before they are hashed or shuffled
    (plan-asserted in tests/test_plans.py). The 100 TB selective-dim
    join when the dim can't broadcast: fact-shuffle bytes ∝ matching
    rows, not table size. Values are untouched by construction (Bloom
    admits false positives only; every admitted row still passes the
    real join), so the oracle is the PLAIN join."""
    from last_minute_legends_spark.operators.runtime_filter import (
        bloom_filtered_join,
    )

    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("event_id", "user_id", "event_type", "value")
    dim = cat.customer.filter(F.col("c_nationkey") == 3).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    # the aggregate goes through `finish` so the WHOLE query plans
    # inside the operator's scoped confs — stacking it on top of the
    # returned frame would replan outside them and lose the filter
    return bloom_filtered_join(
        ev, dim, ev.user_id == dim.user_id,
        finish=lambda j: (
            j.groupBy("c_mktsegment", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .orderBy("c_mktsegment", "event_type")))


BLOOM_SEMI_JOIN_SQL = """
SELECT c.c_mktsegment, e.event_type,
       count(*) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE c.c_nationkey = 3
GROUP BY c.c_mktsegment, e.event_type
ORDER BY c.c_mktsegment, e.event_type
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the events stream: users are
    cohorted by their FIRST active day, and each (cohort, day-offset)
    cell counts the distinct cohort members active that day plus their
    share of the cohort — the standard activation/retention read.

    Shape at scale: one narrow projection to (user_id, day), a
    distinct + min-by-user (both partial-aggregatable shuffles on
    user_id — AQE reuses the exchange), one (cohort, offset) count
    aggregate, and a BROADCAST join of the per-cohort sizes (bounded
    by the day count, not the user count). No window over users, no
    self-join of the fact table."""
    ev = Catalog(spark, sf_dir).events
    days = ev.select(
        "user_id",
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day_us").alias("cohort_us"))
    cells = (
        days.join(first, "user_id")
        .select(
            "cohort_us",
            ((F.col("day_us") - F.col("cohort_us"))
             / F.lit(86_400_000_000)).cast("int").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_us", "day_offset")
        # plain count, NOT count-distinct: the (user, day) rows are
        # distinct by construction and a user has one cohort, so
        # (user, day_offset) is already unique — count-distinct's
        # two-phase expand machinery bought nothing and its x100→x300
        # ladder tail measured superlinear (5.8 → 24.5 s, marginal
        # exponent 1.32); the plain count re-measured 4.4 → 7.3 s
        # (marginal exponent 0.45, scale_local.json)
        .agg(F.count("user_id").alias("n_users"))
    )
    sizes = (cells.filter(F.col("day_offset") == 0)
             .select("cohort_us", F.col("n_users").alias("cohort_size")))
    return (
        cells.join(F.broadcast(sizes), "cohort_us")
        .select(
            "cohort_us", "day_offset", "n_users", "cohort_size",
            F.round(F.col("n_users") / F.col("cohort_size"), 4)
            .alias("retention"),
        )
        .orderBy("cohort_us", "day_offset")
    )


COHORT_RETENTION_SQL = """
WITH days AS (
    SELECT DISTINCT user_id,
           epoch_us(date_trunc('day', ts)) AS day_us
    FROM events
), first AS (
    SELECT user_id, min(day_us) AS cohort_us FROM days GROUP BY user_id
), cells AS (
    -- plain count: (user_id, day_us) is distinct and each user has
    -- one cohort, so (user_id, day_offset) is already unique
    SELECT f.cohort_us,
           CAST((d.day_us - f.cohort_us) / 86400000000 AS INT) AS day_offset,
           count(d.user_id) AS n_users
    FROM days d JOIN first f ON d.user_id = f.user_id
    GROUP BY 1, 2
), sizes AS (
    SELECT cohort_us, n_users AS cohort_size FROM cells WHERE day_offset = 0
)
SELECT c.cohort_us, c.day_offset, c.n_users, s.cohort_size,
       round(c.n_users / CAST(s.cohort_size AS DOUBLE), 4) AS retention
FROM cells c JOIN sizes s ON c.cohort_us = s.cohort_us
ORDER BY c.cohort_us, c.day_offset
"""


EVENTS_LAYOUT_VERSION = "v1"


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per corpus fingerprint) the day-partitioned events
    layout (sources/partitioned_events.py) and return its path —
    write-once, pruned-read-many."""
    import os

    from last_minute_legends_spark.sources import layout_cache
    from last_minute_legends_spark.sources.partitioned_events import (
        write_day_partitioned,
    )

    path = layout_cache.layout_dir(
        "llm_spark_events_by_day",
        os.path.join(sf_dir, "events.parquet"), EVENTS_LAYOUT_VERSION)
    return layout_cache.build_once(
        path,
        lambda tmp: write_day_partitioned(Catalog(spark, sf_dir).events, tmp))


def events_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily rollup of the LAST TWO DAYS of events, read off
    the day-partitioned layout: the range comes from the partition
    LISTING (driver-side metadata, one entry per day), so the scan
    carries a static planning-time PartitionFilter and never touches
    the other day directories (plan-asserted). This is the 100 TB
    recency-query pattern: cost scales with the days touched, not the
    table; the DuckDB oracle computes the same range from the base
    table with the engine-agreed day expression (epoch micros of
    date_trunc('day', ts))."""
    from last_minute_legends_spark.sources.partitioned_events import (
        DAY_US, list_days, read_day_range,
    )

    path = ensure_partitioned_events(spark, sf_dir)
    lo = max(list_days(path)) - DAY_US
    return (
        read_day_range(spark, path, lo)
        .groupBy("event_day_us", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_day_us", "event_type")
    )


EVENTS_PARTITION_PRUNED_SQL = """
WITH d AS (
    SELECT event_type, value,
           epoch_us(date_trunc('day', ts)) AS event_day_us
    FROM events
), mx AS (SELECT max(event_day_us) AS m FROM d)
SELECT event_day_us, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM d, mx
WHERE event_day_us >= m - 86400000000
GROUP BY event_day_us, event_type
ORDER BY event_day_us, event_type
"""


def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert compaction on the CDC path (completing
    latest_by_user's keep-newest story): a deterministic change-set —
    updates (+1000.0 to value for event_id % 10 == 3) and inserts
    (re-keyed copies of event_id % 97 == 0 rows), both restricted to
    the corpus's LAST THREE DAYS — merges into a private copy of the
    day-partitioned events layout via
    sources/partitioned_events.py::merge_day_partitioned: the base
    side reads only the touched day partitions (planning-time
    ``event_day_us IN (...)``), merged partitions land in a staging
    dir, and each touched day directory swaps in as a metadata move —
    untouched partitions keep their files byte-for-byte
    (tests/test_operators.py::test_merge_rewrites_only_touched_days;
    idempotence: re-applying the same change-set is a no-op). Returns
    the merged table's per-day rollup; the oracle replays the same
    merge relationally (DuckDB CTEs)."""
    import atexit
    import shutil
    import tempfile

    from last_minute_legends_spark.sources.partitioned_events import (
        DAY_US, merge_day_partitioned, write_day_partitioned,
    )

    tmp = tempfile.mkdtemp(prefix="llm_spark_cdc_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    path = f"{tmp}/events_by_day"
    events = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    write_day_partitioned(events, path)

    day = F.unix_micros(F.date_trunc("day", F.col("ts")))
    mx = events.agg(F.max("event_id").alias("mid"),
                    F.max(day).alias("md")).collect()[0]
    mid, cutoff = mx.mid, mx.md - 2 * DAY_US

    recent = events.withColumn("event_day_us", day).filter(
        F.col("event_day_us") >= cutoff)
    updates = (recent.filter(F.col("event_id") % 10 == 3)
               .withColumn("value", F.col("value") + F.lit(1000.0)))
    inserts = (recent.filter(F.col("event_id") % 97 == 0)
               .withColumn("event_id",
                           F.col("event_id") + F.lit(mid) + F.lit(1)))
    merge_day_partitioned(spark, path,
                          updates.unionByName(inserts))

    merged = spark.read.parquet(path)
    return (
        merged.groupBy("event_day_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when((F.col("event_id") % 10 == 3)
                           & (F.col("event_id") <= mid)
                           & (F.col("event_day_us") >= cutoff), 1))
            .alias("n_updated"),
            F.count(F.when(F.col("event_id") > mid, 1)).alias("n_inserted"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_day_us")
    )


CDC_MERGE_UPSERT_SQL = """
WITH e AS (
    SELECT event_id, value,
           epoch_us(date_trunc('day', ts)) AS event_day_us
    FROM events WHERE ts IS NOT NULL
), mx AS (
    SELECT max(event_id) AS mid,
           max(event_day_us) - 2 * 86400000000 AS cutoff
    FROM e
), upd AS (
    SELECT event_id, value + 1000.0 AS value, event_day_us
    FROM e, mx WHERE event_id % 10 = 3 AND event_day_us >= cutoff
), ins AS (
    SELECT event_id + mid + 1 AS event_id, value, event_day_us
    FROM e, mx WHERE event_id % 97 = 0 AND event_day_us >= cutoff
), merged AS (
    SELECT event_id, value, event_day_us FROM e
    WHERE event_id NOT IN (SELECT event_id FROM upd)
    UNION ALL SELECT * FROM upd
    UNION ALL SELECT * FROM ins
)
SELECT m.event_day_us,
       count(*) AS n_events,
       count(CASE WHEN m.event_id % 10 = 3 AND m.event_id <= mx.mid
                   AND m.event_day_us >= mx.cutoff THEN 1 END) AS n_updated,
       count(CASE WHEN m.event_id > mx.mid THEN 1 END) AS n_inserted,
       round(sum(m.value), 2) AS sum_value
FROM merged m, mx
GROUP BY m.event_day_us, mx.mid, mx.cutoff
ORDER BY m.event_day_us
"""


def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (sources/partitioned_events.py
    compact_day_partitions): a deliberately FRAGMENTED private copy
    of the day-partitioned events layout (12 files per day — the
    many-epochs/many-tasks landing shape) is compacted in one salted
    shuffle into each day's byte-quota of files, then read back as a
    per-day rollup. Content preservation is the oracle (any lost or
    duplicated row value-mismatches); the file-count collapse and
    retained day pruning are asserted in
    tests/test_operators.py::test_compact_day_partitions."""
    import atexit
    import shutil
    import tempfile

    from last_minute_legends_spark.sources.partitioned_events import (
        compact_day_partitions,
    )

    tmp = tempfile.mkdtemp(prefix="llm_spark_compact_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    events = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    frag = f"{tmp}/fragmented"
    (events.repartition(12)
     .withColumn("event_day_us",
                 F.unix_micros(F.date_trunc("day", F.col("ts"))))
     .write.partitionBy("event_day_us").mode("overwrite").parquet(frag))
    compacted = f"{tmp}/compacted"
    compact_day_partitions(spark, frag, compacted,
                           target_bytes=4 << 20)
    return (
        spark.read.parquet(compacted)
        .groupBy("event_day_us")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_day_us")
    )


COMPACT_SMALL_FILES_SQL = """
SELECT epoch_us(date_trunc('day', ts)) AS event_day_us,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


ZORDER_USER_LO, ZORDER_USER_HI = 10, 60


def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering (sources/zorder.py): a private copy of
    events rewritten on the Morton curve of (user_id, event_day_us),
    then queried with a 2-D selective predicate (a user band AND the
    last week). Day partitioning alone can't skip on user;
    day × user partitioning explodes at 100 TB; the z-ordered flat
    file set gives BOTH axes tight per-file min/max footer stats, so
    any stats-aware reader skips most files
    (tests/test_operators.py::test_zorder_skipping asserts the
    skip-fraction from the actual parquet footers). The oracle
    replays the 2-D aggregate from the base table — content
    preservation + predicate semantics are the value compare."""
    import atexit
    import shutil
    import tempfile

    from last_minute_legends_spark.sources.partitioned_events import DAY_US
    from last_minute_legends_spark.sources.zorder import write_zordered

    tmp = tempfile.mkdtemp(prefix="llm_spark_zorder_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    path = f"{tmp}/events_z"
    events = (Catalog(spark, sf_dir).events
              .filter(F.col("ts").isNotNull())
              .withColumn("event_day_us",
                          F.unix_micros(F.date_trunc("day", F.col("ts")))))
    write_zordered(events, path, "user_id", "event_day_us")

    zdf = spark.read.parquet(path)
    md = zdf.agg(F.max("event_day_us").alias("m")).collect()[0].m
    return (
        zdf.filter(F.col("user_id").between(ZORDER_USER_LO, ZORDER_USER_HI)
                   & (F.col("event_day_us") >= md - 6 * DAY_US))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_type")
    )


ZORDER_EVENTS_SQL = f"""
WITH e AS (
    SELECT event_type, user_id, value,
           epoch_us(date_trunc('day', ts)) AS d
    FROM events WHERE ts IS NOT NULL
), mx AS (SELECT max(d) AS md FROM e)
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS sum_value
FROM e, mx
WHERE user_id BETWEEN {ZORDER_USER_LO} AND {ZORDER_USER_HI}
  AND d >= md - 6 * 86400000000
GROUP BY event_type
ORDER BY event_type
"""


def _landed_epochs(landed_path: str) -> list[int]:
    """Epoch ids present in the day-partitioned landing, from the
    directory LISTING (the metastore analogue the partition-pruned
    reads also use) — the single home of the layout walk all three
    incremental-maintenance entries share."""
    import os

    return sorted({
        int(e.split("=", 1)[1])
        for d in os.listdir(landed_path) if d.startswith("event_day_us=")
        for e in os.listdir(os.path.join(landed_path, d))
        if e.startswith("epoch=")})


def _fold_epochs(epochs, delta_of, merge) -> DataFrame:
    """None-seeded epoch fold: state = merge(state, delta_of(epoch))
    per epoch, each step materialized with an eager localCheckpoint —
    the stored state is aggregate-sized like a real refresh's, and
    the checkpoint keeps the fold from re-reading every prior epoch
    through lineage."""
    state = None
    for ep in epochs:
        delta = delta_of(ep)
        state = delta if state is None else merge(state, delta)
        state = state.localCheckpoint(eager=True)
    return state


def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance over the streamed
    landing: events land in epochs (streaming/pipeline.py
    land_events_partitioned), then the (day, type) rollup is
    maintained ONE EPOCH AT A TIME — each pass reads only that
    epoch's partitions (planning-time ``epoch = N`` PartitionFilter
    on the nested layout, plan-asserted in
    tests/test_operators.py::test_incremental_rollup_epoch_pruning)
    and folds sum-mergeable (count, sum) deltas into rollup state
    whose size is the AGGREGATE's, never the fact table's
    (operators/incremental.py::fold_rollup). The final maintained
    rollup must equal the single-shot aggregate of the base table —
    that equality IS the registered value oracle, so a missed epoch,
    a double-fold, or a non-mergeable measure all value-mismatch."""
    from last_minute_legends_spark.operators.incremental import fold_rollup
    from last_minute_legends_spark.streaming.pipeline import (
        land_events_partitioned,
    )

    landed_path = land_events_partitioned(spark, sf_dir, cache=True)
    landed = spark.read.parquet(landed_path)

    def delta_of(ep):
        return (
            landed.filter(F.col("epoch") == ep)
            .filter(F.col("event_day_us").isNotNull())
            .groupBy("event_day_us", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("raw_sum"))
        )

    rollup = _fold_epochs(
        _landed_epochs(landed_path), delta_of,
        lambda state, delta: fold_rollup(
            state, delta, keys=["event_day_us", "event_type"],
            sums=["n_events", "raw_sum"]))
    return (rollup
            .select("event_day_us", "event_type", "n_events",
                    F.round("raw_sum", 2).alias("sum_value"))
            .orderBy("event_day_us", "event_type"))


INCREMENTAL_ROLLUP_SQL = """
SELECT epoch_us(date_trunc('day', ts)) AS event_day_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


def incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-at-a-time maintenance of per-day DISTINCT users — the
    aggregate ``incremental_rollup`` structurally CANNOT maintain:
    count-distinct is not sum-mergeable, so an exact incremental
    refresh would have to re-read the whole fact table every epoch.
    HLL register state IS mergeable (max over ranks, sum over
    counts), so each maintenance pass reads ONLY that epoch's
    partitions of the streamed landing (same planning-time ``epoch``
    PartitionFilter as incremental_rollup), folds the epoch's
    register delta into running state bounded at m registers per day
    (operators/sketches.py::hll_merge), and only the FINAL state is
    estimated. merge-exactness (tests/test_hll_replay.py) makes the
    maintained registers identical to a single-shot build, so the
    registered oracle is the single-shot DuckDB HLL replay over the
    base table — a missed epoch, a double-fold, or a broken merge
    value-mismatches. This is the 100 TB daily-active-users pattern:
    per-epoch cost ∝ epoch size, state ∝ days × m."""
    from last_minute_legends_spark.operators.sketches import (
        hll_estimate, hll_merge, hll_registers,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        land_events_partitioned,
    )

    landed_path = land_events_partitioned(spark, sf_dir, cache=True)
    landed = spark.read.parquet(landed_path)
    regs = _fold_epochs(
        _landed_epochs(landed_path),
        lambda ep: hll_registers(
            landed.filter(F.col("epoch") == ep)
            .filter(F.col("event_day_us").isNotNull()),
            F.col("user_id"), ["event_day_us"]),
        lambda state, delta: hll_merge(
            state.unionByName(delta), ["event_day_us"]))
    return hll_estimate(regs, ["event_day_us"]).orderBy("event_day_us")


INCREMENTAL_DISTINCT_SQL = _hll_sql(
    "epoch_us(date_trunc('day', ts))", "event_day_us",
    where="WHERE ts IS NOT NULL")


def incremental_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-at-a-time maintenance of per-day QUANTILES — completing
    the maintained-aggregate trio (sums: incremental_rollup, distinct:
    incremental_distinct, quantiles: here). Exact quantiles are not
    mergeable at all; fixed-edge histogram bins are — but the edges
    need global (min, max), so the refresh is TWO epoch-wise sweeps,
    each reading only one epoch's partitions per pass: sweep 1 folds
    the exact per-day (min, max, count) — min/max/sum-mergeable — to
    fix the bin edges; sweep 2 folds per-epoch bin counts against
    those frozen edges (operators/sketches.py::hist_merge). State is
    days × (3 + HIST_BINS) rows throughout; only the final state is
    interpolated. Both merge laws are exact (tested), so the
    registered oracle is the SINGLE-SHOT histogram derivation over
    the base table — a missed epoch in either sweep, a double-fold,
    or drifted edges all value-mismatch."""
    from last_minute_legends_spark.operators.sketches import (
        hist_bins, hist_merge, hist_quantiles,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        land_events_partitioned,
    )

    landed_path = land_events_partitioned(spark, sf_dir, cache=True)
    epochs = _landed_epochs(landed_path)
    landed = spark.read.parquet(landed_path)

    def epoch_rows(ep):
        return (landed.filter(F.col("epoch") == ep)
                .filter(F.col("event_day_us").isNotNull())
                .filter(F.col("value").isNotNull()))

    stats = _fold_epochs(
        epochs,
        lambda ep: epoch_rows(ep).groupBy("event_day_us").agg(
            F.min("value").alias("mn"), F.max("value").alias("mx"),
            F.count(F.lit(1)).alias("n")),
        lambda state, delta: state.unionByName(delta)
        .groupBy("event_day_us").agg(
            F.min("mn").alias("mn"), F.max("mx").alias("mx"),
            F.sum("n").alias("n")))
    bins = _fold_epochs(
        epochs,
        lambda ep: hist_bins(epoch_rows(ep), F.col("value"),
                             ["event_day_us"], stats),
        lambda state, delta: hist_merge(
            state.unionByName(delta), ["event_day_us"]))
    return hist_quantiles(
        bins, stats, ["event_day_us"],
        qs={"p50": 0.5, "p95": 0.95, "p99": 0.99},
    ).orderBy("event_day_us")


INCREMENTAL_QUANTILE_SQL = _hist_quantile_sql(
    "epoch_us(date_trunc('day', ts))", "event_day_us",
    where="WHERE ts IS NOT NULL")


SPARK = {
    "events_by_type": events_by_type,
    "events_windowed": events_windowed,
    "sessionization": sessionization,
    "funnel": funnel,
    "user_segmentation": user_segmentation,
    "user_pivot": user_pivot,
    "json_props": json_props,
    "new_records": new_records_q,
    "price_extraction": price_extraction,
    "asof_join": asof_join_q,
    "range_join": range_join_q,
    "events_quantiles": events_quantiles,
    "moving_avg": moving_avg,
    "events_sketches": events_sketches,
    "events_hll_replay": events_hll_replay,
    "events_hist_quantile": events_hist_quantile,
    "rollup_timeseries": rollup_timeseries,
    "latest_by_user": latest_by_user,
    "skew_join": skew_join,
    "bloom_semi_join": bloom_semi_join,
    "events_partition_pruned": events_partition_pruned,
    "cohort_retention": cohort_retention,
    "cdc_merge_upsert": cdc_merge_upsert,
    "compact_small_files": compact_small_files,
    "zorder_events": zorder_events,
    "incremental_rollup": incremental_rollup,
    "incremental_distinct": incremental_distinct,
    "incremental_quantile": incremental_quantile,
}

# r11 rotation: the four r10 lenders (events_by_type / funnel /
# user_pivot / json_props, driver-hash-green r2–r8) return to the
# window; skew_join — driver-hash-green on its first external
# observation in r10 — lends its slot back and keeps the identical
# value-level compare locally (tests/test_oracle.py).
LOCAL_SQL = {
    "skew_join": SKEW_JOIN_SQL,
    # r14: runtime Bloom-filter semi-join reduction — never observed,
    # so the mechanical rotation windows it this round
    "bloom_semi_join": BLOOM_SEMI_JOIN_SQL,
    # r12: new day-partitioned recency rollup — the 50-slot window is
    # full, so its full value compare runs locally
    # (tests/test_oracle.py::test_local_oracle_match); the pruning
    # itself is plan-asserted in tests/test_plans.py
    "events_partition_pruned": EVENTS_PARTITION_PRUNED_SQL,
    # r12: cohort retention matrix — same full-window situation;
    # rotate into the gate window next round
    "cohort_retention": COHORT_RETENTION_SQL,
    # r13-new: MERGE/upsert compaction — full relational merge replay
    "cdc_merge_upsert": CDC_MERGE_UPSERT_SQL,
    # r13-new: small-file compaction — content preservation is the
    # value compare; file-count collapse asserted in tests
    "compact_small_files": COMPACT_SMALL_FILES_SQL,
    # r13-new: z-order clustering — the 2-D selective aggregate is the
    # value compare; footer-stats skipping asserted in tests
    "zorder_events": ZORDER_EVENTS_SQL,
    # r13-new: incremental MV maintenance — maintained rollup must
    # equal the single-shot aggregate (missed epoch / double-fold
    # value-mismatches)
    "incremental_rollup": INCREMENTAL_ROLLUP_SQL,
}

SQL = {
    "events_by_type": EVENTS_BY_TYPE_SQL,
    "funnel": FUNNEL_SQL,
    "user_pivot": USER_PIVOT_SQL,
    "json_props": JSON_PROPS_SQL,
    "events_windowed": EVENTS_WINDOWED_SQL,
    "sessionization": SESSIONIZATION_SQL,
    "user_segmentation": USER_SEGMENTATION_SQL,
    "new_records": NEW_RECORDS_SQL,
    "price_extraction": PRICE_EXTRACTION_SQL,
    "asof_join": ASOF_JOIN_SQL,
    "range_join": RANGE_JOIN_SQL,
    "events_quantiles": EVENTS_QUANTILES_SQL,
    "moving_avg": MOVING_AVG_SQL,
    "events_sketches": None,   # native HLL++/quantile sketch: rows-only +
    # error-bound test; its portable twin below carries the family's
    # driver-side value check
    "events_hll_replay": EVENTS_HLL_REPLAY_SQL,
    # r13: portable histogram-quantile twin — the percentile_approx
    # black box gets the same replayable stand-in HLL++ got above
    "events_hist_quantile": EVENTS_HIST_QUANTILE_SQL,
    # r13: incrementally-maintained HLL distinct — the oracle is the
    # single-shot replay over the base table, so the epoch fold must
    # reproduce it exactly
    "incremental_distinct": INCREMENTAL_DISTINCT_SQL,
    # r13: two-sweep maintained quantiles — same single-shot-oracle
    # principle
    "incremental_quantile": INCREMENTAL_QUANTILE_SQL,
    "rollup_timeseries": ROLLUP_TIMESERIES_SQL,
    "latest_by_user": LATEST_BY_USER_SQL,
}
