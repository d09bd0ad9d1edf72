"""Cross-engine value replay of the deterministic activity simulator.

simulate_user_activity's every field is a pure hash/arithmetic
function of the row id (sources/simulator.py) — but its production
hash is xxhash64, which no second engine computes, so until now the
generator was verified only by its own parity/determinism tests. Here
the SAME column expressions run with an injected md5-prefix hash
(60-bit, identical in DuckDB), and a from-scratch DuckDB
generate_series replay re-derives the full union-view frame:
registration cadence, the prime-multiplication user-id permutation,
pool-bounded existing-user references, per-type field sets, domain /
language / payment picks, and the hex cart ids. Full rows + schema +
values compare.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from last_minute_legends_spark.sources.simulator import (
    ACTION_TYPES,
    USER_SPACE,
    _PERM_PRIME,
    simulate_user_activity,
)
from tests.oracle import compare, run_oracle

N = 2_000
SEED = 0
START_US = 1_700_000_000_000_000
STEP_US = 1_000_000
N_ITEMS = 200


def _md5_hash_fn(id_col, seed: int, k: int):
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", id_col.cast("string"),
                              F.lit(str(seed)), F.lit(str(k)))),
            1, 15),
        16, 10,
    ).cast("long")


def _dh(k: int) -> str:
    return (f"('0x' || substr(md5(id::VARCHAR || ':{SEED}:{k}'), 1, 15))"
            "::UBIGINT::BIGINT")


def _sql_list(options) -> str:
    return "[" + ", ".join("'" + o + "'" for o in options) + "]"


def _replay_sql() -> str:
    actions = _sql_list(ACTION_TYPES)
    domains = _sql_list(("gmail.com", "yahoo.com", "outlook.com"))
    langs = _sql_list(("eng", "geo", ""))
    pays = _sql_list(("card", "paypal", "apple_pay"))
    return f"""
WITH ids AS (
    SELECT i::BIGINT AS id FROM generate_series(0, {N - 1}) t(i)
), hashed AS (
    SELECT id, (id % 6 = 0) AS is_reg,
           {_dh(1)} AS h1, {_dh(2)} AS h2, {_dh(3)} AS h3,
           {_dh(4)} AS h4, {_dh(5)} AS h5, {_dh(6)} AS h6,
           {_dh(7)} AS h7, {_dh(8)} AS h8
    FROM ids
), derived AS (
    SELECT *,
           CASE WHEN is_reg THEN id // 6
                ELSE h1 % ((id // 6) + 1) END AS reg_idx,
           CASE WHEN is_reg THEN 'consumer_registration'
                ELSE {actions}[(h2 % {len(ACTION_TYPES)}) + 1] END AS ev
    FROM hashed
), uids AS (
    SELECT *, ((reg_idx * {_PERM_PRIME}) % {USER_SPACE} + 1) AS uid
    FROM derived
)
SELECT
    ({START_US} + id * {STEP_US})::VARCHAR AS "timestamp",
    ev AS event_name,
    uid::VARCHAR AS user_id,
    CASE WHEN is_reg THEN (18 + h3 % 78)::INT END AS age,
    CASE WHEN is_reg THEN
        'user' || uid::VARCHAR || '@' || {domains}[(h4 % 3) + 1]
    END AS masked_email,
    CASE WHEN is_reg THEN {langs}[(h5 % 3) + 1] END AS preferred_language,
    CASE WHEN ev IN ('item_view', 'added_to_cart') THEN
        'movie-' || (h6 % {N_ITEMS})::VARCHAR
    END AS item_id,
    CASE WHEN ev IN ('added_to_cart', 'checkout_to_cart') THEN
        'cart-' || hex(h7)
    END AS cart_id,
    CASE WHEN ev = 'checkout_to_cart' THEN {pays}[(h8 % 3) + 1]
    END AS payment_method,
    NULL::VARCHAR AS movie_id,
    NULL::VARCHAR AS title,
    NULL::VARCHAR AS genre,
    NULL::FLOAT AS list_price
FROM uids
ORDER BY id
"""


def test_simulator_duckdb_replay(spark, sf_dir):
    sdf = simulate_user_activity(
        spark, n_events=N, start_us=START_US, step_us=STEP_US,
        seed=SEED, n_items=N_ITEMS, hash_fn=_md5_hash_fn,
    )
    odf = run_oracle(_replay_sql(), sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "simulator replay: " + "\n".join(issues)


def test_injected_hash_default_unchanged(spark):
    """Injection must be a no-op when unset: the default path still
    equals a literal xxhash64 injection."""
    a = simulate_user_activity(spark, n_events=500)
    b = simulate_user_activity(
        spark, n_events=500,
        hash_fn=lambda c, seed, k: F.xxhash64(c, F.lit(seed), F.lit(k)),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_simulator_stream_duckdb_replay(spark, sf_dir):
    """The LIVE streaming generator vs the DuckDB replay: the
    rate-micro-batch stream with the injected hash must emit exactly
    the replay's first N rows — cross-engine evidence that the
    streaming plan (not just its batch twin) derives every field
    correctly. ``timestamp`` is strictly increasing in the row id, so
    ordering by it equals the replay's ORDER BY id."""
    import time as _time

    from last_minute_legends_spark.sources.simulator import (
        simulate_user_activity_stream,
    )

    sim = simulate_user_activity_stream(
        spark, rows_per_batch=1000, seed=SEED, hash_fn=_md5_hash_fn)
    q = (sim.writeStream.format("memory").queryName("sim_replay_stream")
         .outputMode("append").start())
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if spark.table("sim_replay_stream").count() >= N:
                break
            _time.sleep(0.25)
    finally:
        q.stop()
    sdf = spark.table("sim_replay_stream").orderBy("timestamp").limit(N)
    odf = run_oracle(_replay_sql(), sf_dir)
    issues = compare(sdf, odf)
    assert not issues, "stream simulator replay: " + "\n".join(issues)
