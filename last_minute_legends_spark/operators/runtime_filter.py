"""Runtime Bloom-filter semi-join reduction — the selective-dim join
at shuffle scale.

The 100 TB pattern this exists for: a fact⋈dim join where the dim
carries a selective predicate but is still too big (or too mid-plan)
to broadcast. A plain shuffle join moves EVERY fact row to a reducer
and discards the non-matching ones there — the fact shuffle is the
whole cost. Catalyst's InjectRuntimeFilter rewrite
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) instead builds a
Bloom filter over the dim's join keys (`bloom_filter_agg`, a tiny
all-to-one aggregate bounded by the FILTERED dim size) and stamps a
`might_contain` predicate onto the fact side BELOW the exchange —
non-matching fact rows (minus the Bloom false-positive rate) die
before they are ever hashed, serialized, or shuffled. Same answer,
fact-shuffle bytes ∝ matching rows instead of table size.

Spark gates the rewrite on size thresholds meant for real clusters
(application side > 10 GB by default), so the helper here scopes the
enabling confs around PLANNING only: Catalyst reads confs when the
query is first planned, and a Dataset caches its QueryExecution — so
forcing physical planning inside the scope bakes the Bloom filter
into the returned DataFrame, and the session confs are restored
before the caller ever executes it (no leakage into other queries on
the shared session; asserted in tests/test_plans.py).

Correctness is untouched by construction: a Bloom filter admits false
positives only, and every admitted row still passes the real join —
the registered oracle is the PLAIN join SQL.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import Column, DataFrame


_PLANNING_CONFS = {
    # force the shuffle-join regime the rewrite targets (a broadcast
    # join would already prune fact rows with its own hash relation)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local corpora sit far under the cluster-scale default gates
    # (10 GB application side); the rewrite itself is size-agnostic
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@contextlib.contextmanager
def _scoped_confs(spark, confs: dict):
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def bloom_filtered_join(fact: DataFrame, dim: DataFrame,
                        cond: Column, how: str = "inner",
                        finish=None) -> DataFrame:
    """``fact.join(dim, cond, how)`` planned under the runtime
    Bloom-filter rewrite: the returned DataFrame's physical plan
    carries ``bloom_filter_agg`` over the dim keys and a
    ``might_contain`` filter on the fact side below its shuffle
    (plan-asserted in tests). Planning happens HERE, inside the
    scoped confs; the session's conf state is restored before
    returning, so nothing leaks to other queries.

    ``finish`` (optional, ``DataFrame -> DataFrame``) applies the
    caller's downstream operators (aggregates, ordering, projection)
    BEFORE planning is forced. It exists because the rewrite is a
    logical-optimizer rule and a Dataset plans lazily: stacking
    operators on top of the returned DataFrame AFTER this call would
    create a new Dataset that replans the whole tree outside the
    scoped confs — and silently lose the Bloom filter (measured: the
    first formulation of the bloom_semi_join entry planned agg-on-top
    and got a plain shuffle join). The returned DataFrame is
    therefore the TERMINAL query; execute it as returned."""
    spark = fact.sparkSession
    with _scoped_confs(spark, _PLANNING_CONFS):
        out = fact.join(dim, cond, how)
        if finish is not None:
            out = finish(out)
        # force (and cache) physical planning under the scoped confs —
        # a Dataset plans once and keeps its QueryExecution
        out._jdf.queryExecution().executedPlan()
    return out
