"""Deterministic distributed user-activity generator.

Reference parity: /root/reference/UserActivitySimulator.py:73-110
drives a single-threaded driver loop — per event it draws
``random.choice`` over 6 event classes, mutates shared state
(UserManager.existing_users, the cart-id list,
/root/reference/UserManager.py:10-22) and produces one Kafka record
per ~second. Re-expressed Spark-first: ``spark.range(n)`` is the
event stream, and every field is a pure hash/arithmetic function of
the row id — no RNG state, no driver loop, no shuffle — so
generation parallelizes over range splits and produces identical
data at any partitioning (generate 100 TB of load-test events as
fast as executors can write).

State the reference keeps imperatively becomes closed-form:

- **Lazy user registration** (UserManager.get_existing_user): event
  ids ≡ 0 (mod 6) are registrations (matching the uniform-choice
  1/6 rate); registration #r mints ``uid = (r * 999983) % 1e6 + 1``
  — multiplication by a prime coprime to 1e6 is a PERMUTATION of
  [1, 1e6], so minted ids are unique without a uniqueness set. An
  action event at id references registration
  ``hash(id) mod (floor(id/6) + 1)`` — only users registered at or
  before its own position, exactly the reference's
  pick-an-existing-user semantics.
- **Cart ids** are hash-derived per event; the reference's global
  cart-id pool (an unbounded driver-side list) is deliberately not
  modeled — checkout/cart referential integrity would need a join
  against generated state, which a load generator should not pay.

The per-type field sets match USER_EVENT_SCHEMAS exactly, so the
wire render feeds the existing parse/analytics path unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.sources.streams import (
    TYPED_UNION_SCHEMA,
    USER_EVENT_SCHEMAS,
)

USER_SPACE = 1_000_000          # UserManager draws ids from [1, 1e6]
_PERM_PRIME = 999_983           # coprime to USER_SPACE -> bijection

ACTION_TYPES = ("sign_in", "sign_out", "item_view", "added_to_cart",
                "checkout_to_cart")


def simulated_event_columns(start_us: int = 1_700_000_000_000_000,
                            step_us: int = 1_000_000, seed: int = 0,
                            n_items: int = 200, hash_fn=None) -> list:
    """The generator itself: TYPED_UNION_SCHEMA-ordered column
    expressions, each a pure hash/arithmetic function of an ``id``
    column. Works over any monotonically-ids'd frame — batch
    ``spark.range`` and the streaming rate source alike.

    ``hash_fn(id_col, seed, k) -> Column`` defaults to the xxhash64
    form (production path). Injectable only so the DuckDB replay test
    (tests/test_simulator_replay.py) can swap in an md5-prefix hash
    both engines compute identically, value-checking every closed-form
    derivation (registration permutation, pool-bounded user refs,
    per-type field sets) against an independent engine."""
    def h(k: int):
        if hash_fn is not None:
            return hash_fn(F.col("id"), seed, k)
        return F.xxhash64(F.col("id"), F.lit(seed), F.lit(k))

    def pick(options: tuple[str, ...], k: int):
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (F.pmod(h(k), F.lit(len(options))) + 1).cast("int"),
        )

    is_reg = F.col("id") % 6 == 0
    reg_idx = F.when(
        is_reg, F.floor(F.col("id") / 6)
    ).otherwise(
        # a registration exists at every 6k <= id, so the pool of
        # already-minted users at event id has floor(id/6)+1 members
        F.pmod(h(1), F.floor(F.col("id") / 6) + 1)
    )
    uid = (F.pmod(reg_idx * _PERM_PRIME, F.lit(USER_SPACE)) + 1)
    ev = F.when(is_reg, F.lit("consumer_registration")).otherwise(
        F.element_at(
            F.array(*[F.lit(t) for t in ACTION_TYPES]),
            (F.pmod(h(2), F.lit(len(ACTION_TYPES))) + 1).cast("int"),
        )
    )
    item_types = ev.isin("item_view", "added_to_cart")
    cart_types = ev.isin("added_to_cart", "checkout_to_cart")
    cols = {
        "timestamp": (F.lit(start_us) + F.col("id") * F.lit(step_us)).cast("string"),
        "event_name": ev,
        "user_id": uid.cast("string"),
        "age": F.when(is_reg, (F.lit(18) + F.pmod(h(3), F.lit(78))).cast("int")),
        "masked_email": F.when(is_reg, F.concat(
            F.lit("user"), uid.cast("string"), F.lit("@"),
            pick(("gmail.com", "yahoo.com", "outlook.com"), 4),
        )),
        "preferred_language": F.when(is_reg, pick(("eng", "geo", ""), 5)),
        "item_id": F.when(item_types,
                          F.concat(F.lit("movie-"),
                                   F.pmod(h(6), F.lit(n_items)).cast("string"))),
        "cart_id": F.when(cart_types,
                          F.concat(F.lit("cart-"), F.hex(h(7)))),
        "payment_method": F.when(ev == "checkout_to_cart",
                                 pick(("card", "paypal", "apple_pay"), 8)),
    }
    return [
        (cols[f.name] if f.name in cols else F.lit(None))
        .cast(f.dataType).alias(f.name)
        for f in TYPED_UNION_SCHEMA.fields
    ]


def simulate_user_activity(spark: SparkSession, n_events: int = 10_000,
                           start_us: int = 1_700_000_000_000_000,
                           step_us: int = 1_000_000, seed: int = 0,
                           n_items: int = 200, hash_fn=None) -> DataFrame:
    """(union-view typed event frame) — ``n_events`` deterministic
    user-activity events, one per ``step_us`` of simulated time."""
    return spark.range(n_events).select(
        *simulated_event_columns(start_us, step_us, seed, n_items, hash_fn))


def simulate_user_activity_stream(spark: SparkSession,
                                  rows_per_batch: int = 1000,
                                  seed: int = 0,
                                  hash_fn=None) -> DataFrame:
    """Unbounded streaming twin of ``simulate_user_activity``: the
    rate-micro-batch source supplies monotonically increasing ids
    (``value``), and every event field is the same pure function of
    the id — so the stream is a live load generator whose content is
    REPRODUCIBLE: batch ``simulate_user_activity(n)`` equals the
    first ``n`` streamed events exactly (parity-tested). Feed
    ``simulated_as_typed_json`` + ``parse_typed_events`` (or the
    gated Kafka sink) downstream, mirroring the reference's
    simulator -> topic -> consumer loop as ONE streaming plan.
    """
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", max(1, rows_per_batch // 250))
        .load()
    )
    return raw.select(F.col("value").alias("id")).select(
        *simulated_event_columns(seed=seed, hash_fn=hash_fn))


def simulated_as_typed_json(sim: DataFrame) -> DataFrame:
    """Simulated union-view frame → (value: string) per-topic wire
    records, each type rendered with ITS schema's fields only (one
    CASE pass — the source is scanned once, same as
    events_as_typed_json)."""
    value = None
    for ev_name, schema in USER_EVENT_SCHEMAS.items():
        rendered = F.to_json(F.struct(*[F.col(f.name) for f in schema.fields]))
        value = (F.when(F.col("event_name") == ev_name, rendered)
                 if value is None
                 else value.when(F.col("event_name") == ev_name, rendered))
    return sim.select(value.alias("value")).filter(F.col("value").isNotNull())
