"""Query registry: SURVEY §2 inventory wired to (spark, sf_dir).

``QUERIES`` maps every implemented query key to a callable
``(SparkSession, sf_dir) -> DataFrame``; ``ORACLE_SQL`` maps the
SQL-expressible subset to DuckDB-runnable ANSI SQL over the same
parquet tables (the driver's correctness gate). Keys without an
oracle entry get a rows-only check (non-SQL-expressible operators:
streaming, LSH candidates, mapInPandas features).
"""

from __future__ import annotations

import sys

from last_minute_legends_spark.plans import olap

_MODULES = [olap]

# Keep imports soft ONLY for genuinely optional modules — but never
# silently: a typo'd import would otherwise drop a whole family from
# the registry and the correctness gate would report nothing for it.
for _name in ("events_analytics", "dedup_q", "ann_q", "text_q", "multimodal_q",
               "stream_q", "sql_q", "curation_q"):
    try:
        _mod = __import__(f"last_minute_legends_spark.plans.{_name}", fromlist=[_name])
        _MODULES.append(_mod)
    except ImportError as exc:
        print(
            f"WARNING: query family plans.{_name} failed to import "
            f"({exc!r}) — its queries are MISSING from the registry",
            file=sys.stderr,
        )

QUERIES = {}
# Every value-level DuckDB oracle the modules declare (their SQL and
# LOCAL_SQL dicts merged — since r13 the SQL/LOCAL_SQL split inside a
# module no longer decides window placement; the mechanical staleness
# ranking below does).
_ALL_SQL = {}
for _m in _MODULES:
    QUERIES.update(getattr(_m, "SPARK", {}))
    _ALL_SQL.update({k: v for k, v in getattr(_m, "SQL", {}).items() if v})
    _ALL_SQL.update(
        {k: v for k, v in getattr(_m, "LOCAL_SQL", {}).items() if v})

# The driver's correctness gate records only the FIRST ORACLE_WINDOW
# entries of this dict, in registration order (observed r3:
# CORRECTNESS_r03.json stops at exactly entry #50; a gate-side fix is
# out of our hands). The cost is honest and real: entries past the
# window get NO driver-side check at all that round — not even the
# rows-only one. Entries outside the window keep their value-level
# DuckDB compare locally (LOCAL_ORACLE_SQL + tests/test_oracle.py,
# the driver's own comparison), plus the streaming batch-parity /
# brute-force cross-check / geometry-oracle tests — strictly more
# than the driver's rows-only count would check — but a reviewer
# should know the external gate does not see them that round.
ORACLE_WINDOW = 50

# MECHANICAL ROTATION (r13, closing VERDICT r12 #2 "record the
# rotation schedule so staleness is mechanical, not curated"):
# tools/rotation.py distills every CORRECTNESS_r*.json the driver has
# written into driver_observations.json — per key, the last round the
# driver's value compare passed (hash_green) and the last round the
# driver recorded any row count (rows_observed). The window then
# takes the STALEST keys first:
#   - ROWS_ONLY_SLOTS slots go to the least-recently-observed
#     non-SQL-expressible entries (driver rows-only confirmation);
#   - the remaining slots go to the least-recently-hash-green
#     oracle-capable entries (full driver value compare).
# Never-observed keys rank stalest of all, so a new operator's oracle
# enters the window the round it ships. With ~112 oracle-capable keys
# and 45 oracle slots, every oracle entry is driver-value-checked at
# least every 3 rounds; ties break by registration order.
import json as _json
import os as _os

_OBS_PATH = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          "driver_observations.json")
try:
    with open(_OBS_PATH) as _fh:
        _obs = _json.load(_fh)
except (OSError, ValueError):  # pragma: no cover - missing obs file
    print("WARNING: driver_observations.json unreadable — window "
          "rotation falls back to registration order", file=sys.stderr)
    _obs = {}
LAST_HASH_GREEN: dict[str, int] = _obs.get("hash_green", {})
LAST_ROWS_OBSERVED: dict[str, int] = _obs.get("rows_observed", {})

# r15: 3 → 5 (VERDICT r14 #2). Five rows-only keys (stream_enrich,
# stream_dedup, stream_curate, simulate_events, simulate_stream) were
# last driver-observed in r10 — a 3-slot reservation cycles the
# 11-key rows-only pool on a ~4-round cadence, too slow. 5 slots
# still leaves 45 oracle slots for the ~97-key oracle pool
# (≤3-round value-check cadence, unchanged guarantee).
ROWS_ONLY_SLOTS = 5

_reg_order = {k: i for i, k in enumerate(QUERIES)}
_sql_ranked = sorted(
    (k for k in QUERIES if k in _ALL_SQL),
    key=lambda k: (LAST_HASH_GREEN.get(k, 0), _reg_order[k]))
_rows_ranked = sorted(
    (k for k in QUERIES if k not in _ALL_SQL),
    key=lambda k: (LAST_ROWS_OBSERVED.get(k, 0), _reg_order[k]))

# Rows-only entries promoted into this round's reserved slots (one
# round of driver-visible confirmation each).
WINDOW_ROTATE: list[str] = _rows_ranked[:ROWS_ONLY_SLOTS]
_window_sql = _sql_ranked[:ORACLE_WINDOW - len(WINDOW_ROTATE)]

# What the driver sees (__spark_entry__.oracle_sql()).
ORACLE_SQL = {k: _ALL_SQL[k] for k in _window_sql}
# Value-level DuckDB oracles for entries past the driver's window —
# run by tests/test_oracle.py with the driver's own comparison, but
# never exported through __spark_entry__.oracle_sql().
LOCAL_ORACLE_SQL = {k: _ALL_SQL[k]
                    for k in _sql_ranked[len(_window_sql):]}

_order = (
    [k for k in QUERIES if k in ORACLE_SQL]
    + [k for k in WINDOW_ROTATE if k in QUERIES and k not in ORACLE_SQL]
    + [k for k in QUERIES if k not in ORACLE_SQL and k not in WINDOW_ROTATE]
)
QUERIES = {k: QUERIES[k] for k in _order}

# The window budget is oracle-backed entries PLUS rotated-in rows-only
# entries; either kind of growth can overflow it. Fail loudly at
# import with the cause, not downstream with a confusing
# "missed the window" test failure.
_window_need = len(ORACLE_SQL) + len([k for k in WINDOW_ROTATE if k in QUERIES])
if _window_need > ORACLE_WINDOW:  # pragma: no cover - guarded by tests
    print(
        f"WARNING: {len(ORACLE_SQL)} oracle-backed + "
        f"{len(WINDOW_ROTATE)} rotated rows-only queries = {_window_need} "
        f"> the driver's {ORACLE_WINDOW}-entry correctness window — the "
        "overflow would go ungraded; lower ROWS_ONLY_SLOTS "
        "(see tests/test_plans.py window test)",
        file=sys.stderr,
    )
