"""Streaming + text-catalog ETL tests: real streaming runs via the
file source with processAllAvailable, plus batch/streaming parity."""

from pyspark.sql import functions as F


def test_catalog_etl_roundtrip(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import catalog_text_etl
    from last_minute_legends_spark.sources.tables import Catalog

    part = Catalog(spark, sf_dir).part
    out = catalog_text_etl(spark, sf_dir)
    assert out.count() == part.count()
    # item ids are the running-sum order = ascending p_partkey order
    joined = (
        out.orderBy("item_id").limit(5).collect(),
        part.orderBy("p_partkey").limit(5).collect(),
    )
    for o, p in zip(*joined):
        assert o.name == p.p_name
        assert o.brand == p.p_brand
        assert o.size == p.p_size
        assert abs(o.price_usd - round(p.p_retailprice, 2)) < 1e-9


def test_block_id_prefix_sum_matches_global_window(spark):
    """The two-phase distributed prefix sum must equal the naive
    single-window running sum."""
    from last_minute_legends_spark.sources.text_catalog import assign_block_ids

    rows = []
    ln = 0
    for item in range(50):
        rows.append((ln, f"ITEM {item}")); ln += 1
        for k in range(3):
            rows.append((ln, f"k{k}=v")); ln += 1
    lines = spark.createDataFrame(rows, "line_no long, line string").repartition(7)
    out = assign_block_ids(lines)
    got = {r.line_no: r.item_id for r in out.collect()}
    expect_item = 0
    for line_no, line in rows:
        if line.startswith("ITEM"):
            expect_item += 1
        assert got[line_no] == expect_item, f"line {line_no}"


def test_stream_pipeline_matches_batch_window(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import stream_pipeline
    from last_minute_legends_spark.plans.events_analytics import events_windowed

    streamed = stream_pipeline(spark, sf_dir)
    batch = events_windowed(spark, sf_dir).select(
        "window_start_us", "event_type", "n_events", "sum_value"
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, f"stream/batch mismatch: {len(s)} vs {len(b)} groups"


def test_stream_sessionize_matches_batch(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import stream_sessionize
    from last_minute_legends_spark.plans.events_analytics import sessionization

    streamed = stream_sessionize(spark, sf_dir)
    batch = sessionization(spark, sf_dir)
    # identical gap rule → identical session set (start, end, count)
    s = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
         for r in streamed.collect()}
    b = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
         for r in batch.collect()}
    assert s == b, (
        f"streaming sessions != batch sessions: {len(s)} vs {len(b)}; "
        f"only-stream={list(s - b)[:3]} only-batch={list(b - s)[:3]}"
    )
