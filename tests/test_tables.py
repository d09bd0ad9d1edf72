"""load_table dtype-proofing.

The driver has regenerated the testdata's ``events.ts`` encoding once
already (parquet TIMESTAMP(NANOS) through round 6, plain
``timestamp[us]`` from round 7; the adjusted-to-UTC micros variant is
covered pre-emptively). ``load_table`` must normalize every
shape it has ever seen to one output schema — session-UTC ``timestamp``
plus int64 ``ts_ns`` — so the 20+ ``unix_micros(ts)`` call sites keep
working no matter which generation of parquet is on disk.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from last_minute_legends_spark.sources.tables import load_table

_ROWS = [
    # (event_id, micros-since-epoch, user_id, event_type, value, props)
    (1, 1_700_000_000_000_000, 7, "view", 1.5, "{}"),
    (2, 1_700_000_123_456_789, 8, "purchase", 9.25, "{}"),
    (3, 1_700_009_999_000_001, 7, "click", 0.0, "{}"),
]


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
        "value": pa.array([r[4] for r in _ROWS], pa.float64()),
        "props": pa.array([r[5] for r in _ROWS], pa.string()),
    })
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.fixture(scope="module")
def shaped_dirs(tmp_path_factory):
    micros = [r[1] for r in _ROWS]
    nanos_dir = _write_events(
        str(tmp_path_factory.mktemp("nanos")),
        pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
    )
    micros_dir = _write_events(
        str(tmp_path_factory.mktemp("micros")),
        pa.array(micros, pa.timestamp("us")),
    )
    # the adjusted-to-UTC variant Spark reads as plain TIMESTAMP
    # (not NTZ) — a plausible next driver encoding
    utc_dir = _write_events(
        str(tmp_path_factory.mktemp("utc")),
        pa.array(micros, pa.timestamp("us", tz="UTC")),
    )
    return nanos_dir, micros_dir, utc_dir


def test_all_parquet_shapes_normalize_identically(spark, shaped_dirs):
    loaded = [load_table(spark, d, "events") for d in shaped_dirs]
    a = loaded[0]
    for b in loaded[1:]:
        assert a.schema == b.schema, (
            f"ingest shapes diverge: {a.schema} vs {b.schema}"
        )
    assert dict(a.dtypes)["ts"] == "timestamp"
    assert dict(a.dtypes)["ts_ns"] == "bigint"
    rows = [sorted(df.select("event_id", "ts", "ts_ns").collect())
            for df in loaded]
    for other in rows[1:]:
        assert rows[0] == other
    # spot-check the actual values (session tz is UTC, so the wall
    # clock must equal the epoch micros we wrote)
    by_id = {r["event_id"]: r for r in rows[0]}
    assert by_id[1]["ts"] == datetime.datetime(2023, 11, 14, 22, 13, 20)
    assert by_id[2]["ts_ns"] == 1_700_000_123_456_789 * 1000


def test_unknown_ts_dtype_fails_loudly(spark, tmp_path):
    """A fourth encoding must fail AT LOAD with a pointer to the fix,
    not at plan time in 12 call sites."""
    _write_events(
        str(tmp_path),
        pa.array([str(r[1]) for r in _ROWS], pa.string()),
    )
    with pytest.raises(TypeError, match="unhandled dtype"):
        load_table(spark, str(tmp_path), "events")


def test_unix_micros_works_on_loaded_events(spark, shaped_dirs):
    """The exact expression every analytics plan uses must resolve."""
    from pyspark.sql import functions as F

    for d in shaped_dirs:
        got = (load_table(spark, d, "events")
               .select(F.unix_micros("ts").alias("us"))
               .agg(F.min("us").alias("m")).collect()[0]["m"])
        assert got == 1_700_000_000_000_000
