"""Bucket-partitioned persistence for maintained cluster labels —
the last O(corpus)-per-epoch term in the delta-dedup lifecycle made
epoch-sized (VERDICT r16 #1).

``merge_cluster_labels`` (operators/dedup_delta.py) already folds an
epoch's new duplicate pairs with EPOCH-SIZED compute: iterative CC
runs only on the contracted graph (touched labels × new pairs) and
the corpus-sized labels frame is mapped once through a broadcast
merge map. But both persistence paths then rewrote the WHOLE labels
frame per epoch — at 100 TB a full-table rewrite per micro-batch.

This module persists the labels partitioned by
``lbk = pmod(xxhash64(cluster_id), K)`` (the merge_day_partitioned
pattern, sources/partitioned_events.py:107). The key property that
makes the rewrite epoch-sized: an epoch's merge map is epoch-sized,
every row whose label changes has its OLD cluster_id in the map's
keys, and every destination label is the min over merged old labels
— i.e. itself one of the map's keys. So the set of bucket
directories that can gain, lose, or change a row is exactly
``buckets(merge-map keys)`` — bounded by the epoch, not the corpus —
and the rewrite touches only those directories (planning-time
``lbk IN (...)`` partition pruning on the read, per-directory rename
swap on the write; untouched bucket files keep byte identity,
test-locked). Bucketing by cluster_id (not id) is what makes this
work: when two clusters merge, every member row of the losing
cluster must change, and those rows are CO-LOCATED in the losing
label's bucket — bucketed by id they would be spread across every
bucket and any merge would touch the whole table.

Crash/redelivery story (matches the band-index discipline):
- the per-bucket swap renames the live dir to ``<dir>__old`` before
  installing the staged replacement; ``recover_labels_store`` (called
  from every read path) restores a dir stranded mid-swap;
- a fold interrupted mid-swap leaves SOME buckets pre-merge and some
  post-merge — consistent under re-fold, because the merge is
  confluent: re-running the same epoch maps already-merged edges to
  la == lb no-ops and re-derives exactly the outstanding merges
  (locked by the redelivery test in tests/test_labels_store.py).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LABELS = "labels"
_LPARAMS = "_labels_store_params.json"

# Minimum bucket count for the partitioned layout (r18: 64 -> 16 —
# a tiny store's fold touched ~60 of 64 dirs per epoch, paying ~60
# file creates + dir swaps of pure commit overhead per fold on this
# fork-per-chmod sandbox; 16 keeps growth head-room to 65k rows
# before auto-sizing kicks in while quartering the small-store fold's
# file ops. Layout-only: stores record their own n_buckets). Layout-only (never
# enters the label semantics). The default build SIZES the bucket
# count to the label count (next power of two of
# rows / TARGET_ROWS_PER_BUCKET, floored at LABEL_BUCKETS — the
# spark.sql.shuffle.partitions sizing discipline): what makes a
# FIXED-SIZE epoch's fold flat as the corpus grows is bounded bucket
# SIZE, not bounded bucket count — an epoch touches O(epoch) buckets
# of O(TARGET) rows each, so fold I/O ∝ epoch at any corpus size
# (measured by the dedup_clusters_delta_fixed ladder cell).
LABEL_BUCKETS = 16
TARGET_ROWS_PER_BUCKET = 4_096


def _auto_buckets(n_rows: int) -> int:
    import math

    need = max(1, (n_rows + TARGET_ROWS_PER_BUCKET - 1)
               // TARGET_ROWS_PER_BUCKET)
    return max(LABEL_BUCKETS, 1 << math.ceil(math.log2(need)))


def _lbk(col, n_buckets: int):
    """Partition bucket of a cluster label — xxhash64 routing, layout
    only (the operators/dedup_delta.py ``_bvb`` discipline)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def _params_path(path: str) -> str:
    # params live INSIDE the data dir so any future staged swap of the
    # whole layout carries them atomically (the _eparams_path lesson)
    return os.path.join(path, _LABELS, _LPARAMS)


def write_labels_store(labels: DataFrame, path: str,
                       n_buckets: int | None = None) -> None:
    """One-time base build: (id, cluster_id) partitioned by the
    cluster-label hash bucket, id-sorted files. ``n_buckets=None``
    sizes the bucket count to the label count (see _auto_buckets).

    The params file records the SCHEMA alongside n_buckets: a
    legitimately EMPTY store (a seed corpus with no duplicate pairs
    yet) has zero partition dirs, and a schema-less partitioned read
    would fail UNABLE_TO_INFER_SCHEMA — every read therefore supplies
    the recorded schema."""
    lab = labels.select("id", "cluster_id")
    if n_buckets is None:
        n_buckets = _auto_buckets(lab.count())
    with_bucket = lab.withColumn("lbk", _lbk(F.col("cluster_id"),
                                             n_buckets))
    # explicit partition count (USER-SPECIFIED, so AQE cannot fold
    # the fan-out write to one task that creates every bucket file
    # sequentially — the dedup_delta._fanout_parts rationale) and an
    # explicit (lbk, id) sort that prefix-satisfies the dynamic-
    # partition writer's required ordering: id order in-file by
    # construction, one file per bucket dir
    n_write = min(lab.sparkSession.sparkContext.defaultParallelism,
                  n_buckets)
    (with_bucket
     .repartition(n_write, F.col("lbk"))
     .sortWithinPartitions("lbk", "id")
     .write.partitionBy("lbk").mode("overwrite")
     .parquet(os.path.join(path, _LABELS)))
    tmp = _params_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"n_buckets": n_buckets,
                   "schema": with_bucket.schema.json()}, fh)
    os.replace(tmp, _params_path(path))


def _read_params(path: str) -> dict:
    with open(_params_path(path)) as fh:
        return json.load(fh)


def _store_df(spark: SparkSession, path: str, params: dict) -> DataFrame:
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(params["schema"]))
    return (spark.read.schema(schema)
            .parquet(os.path.join(path, _LABELS)))


def read_labels_store(spark: SparkSession, path: str) -> DataFrame:
    """(id, cluster_id) over the whole store."""
    recover_labels_store(path)
    return (_store_df(spark, path, _read_params(path))
            .select("id", "cluster_id"))


def recover_labels_store(path: str) -> bool:
    """Restore bucket dirs stranded mid-swap by a crashed fold: a
    ``lbk=<b>__old`` beside a MISSING live dir moves back; beside a
    present live dir the swap finished — drop the leftover.

    Runs from every read path, so (the band-index lesson, ADVICE r16)
    it must tolerate a LIVE fold: when the store's merge lock names a
    live foreign owner, the apparent mid-swap state is an in-flight
    swap — skip rather than yank ``__old`` back out from under it."""
    from last_minute_legends_spark.operators.dedup_delta import (
        _lock_owner_alive,
    )

    lock = f"{path}__merge.lock"
    if os.path.exists(lock) and _lock_owner_alive(lock):
        try:
            with open(lock) as fh:
                owner = int(fh.read().strip() or "0")
        except (OSError, ValueError):
            owner = 0
        if owner != os.getpid():
            return False
    root = os.path.join(path, _LABELS)
    if not os.path.isdir(root):
        return False
    # a crashed fold's process-unique staging dir is dead weight once
    # its owner pid is gone — sweep it so orphans don't accumulate
    for name in os.listdir(path):
        if "__merge_staged_" in name:
            try:
                pid = int(name.rsplit("_", 1)[-1])
                os.kill(pid, 0)
            except (ValueError, ProcessLookupError):
                shutil.rmtree(os.path.join(path, name),
                              ignore_errors=True)
            except OSError:
                pass  # EPERM: live foreign owner — leave it
    restored = False
    for name in os.listdir(root):
        if not name.endswith("__old"):
            continue
        live = os.path.join(root, name[:-len("__old")])
        saved = os.path.join(root, name)
        if not os.path.exists(live):
            try:
                os.rename(saved, live)
                restored = True
            except OSError:
                if not os.path.exists(live):
                    raise
        else:
            shutil.rmtree(saved, ignore_errors=True)
    return restored


class _merge_lock:
    """Exclusive per-store fold lock (the dedup_delta._compact_lock
    sentinel with errno-precise liveness — EPERM is a LIVE foreign
    owner, only ESRCH steals): two concurrent write-folds would
    interleave their per-bucket swaps into a half-A-half-B labeling,
    so writers serialize; readers consult the lock in
    recover_labels_store instead of taking it."""

    def __init__(self, path: str):
        self.lock = f"{path}__merge.lock"

    def __enter__(self):
        from last_minute_legends_spark.operators.dedup_delta import (
            _lock_owner_alive,
        )

        for _ in range(2):
            try:
                fd = os.open(self.lock,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                if not _lock_owner_alive(self.lock):
                    try:
                        os.unlink(self.lock)
                    except OSError:
                        pass
                    continue
                raise RuntimeError(
                    f"label fold on {self.lock[:-len('__merge.lock')]!r} "
                    "already in flight — retry after it finishes")
        raise RuntimeError(f"could not acquire {self.lock}")

    def __exit__(self, *exc):
        try:
            os.unlink(self.lock)
        except OSError:
            pass
        return False


def merge_labels_store(spark: SparkSession, path: str,
                       new_edges: DataFrame,
                       write: bool = True) -> DataFrame:
    """Fold one epoch's new duplicate pairs into the persisted labels
    and return the FULL updated (id, cluster_id) frame —
    value-identical to ``connected_components`` over the whole
    accumulated pair graph (the merge_cluster_labels contract, same
    contracted-graph compute), with per-epoch label I/O bounded by
    the epoch:

    - label lookup for the edges' endpoints: one narrow equi-join
      against the store (projected scan — the one corpus-sized READ
      the fold semantically needs);
    - contracted-graph CC → an epoch-sized merge map;
    - rewrite (``write=True``): ONLY the bucket directories holding a
      merge-map key are read (planning-time ``lbk IN (...)`` — Spark
      prunes the other partitions off the listing), remapped through
      the broadcast map, and swapped in per-directory; every other
      bucket file is untouched byte-for-byte. New nodes insert into
      their destination label's bucket, which is always a touched
      bucket (destination labels are merge-map keys).

    ``write=False`` computes the same result read-only (shared cached
    stores — the absorb ``append=False`` discipline): untouched
    buckets pass through as a partition-pruned complement scan.

    A no-op epoch (every edge already intra-cluster, every node
    already labeled) touches ZERO buckets. Write-folds hold the
    store's merge lock for their whole duration (lookup → contracted
    CC → swap): interleaved per-bucket swaps from two concurrent
    folds would leave a half-A-half-B labeling, and fold SEMANTICS
    require serialization anyway (each fold's merge map is computed
    against the labeling it rewrites)."""
    if write:
        with _merge_lock(path):
            return _merge_impl(spark, path, new_edges, write=True)
    return _merge_impl(spark, path, new_edges, write=False)


def _merge_impl(spark: SparkSession, path: str, new_edges: DataFrame,
                write: bool) -> DataFrame:
    recover_labels_store(path)
    params = _read_params(path)

    # size-gated LOCAL fold (r18, VERDICT r17 #1/#2): an epoch's edge
    # set is epoch-sized by construction, so collect it (bounded probe
    # — the connected_components LOCAL_EDGES_MAX discipline) and run
    # the contracted-graph fold with driver-side union-find instead of
    # 5-6 scheduled jobs of persist + iterative-CC checkpoint/count/
    # collect + touched-collect. Identical labels: same min-label
    # semantics (locked by tests/test_labels_store.py, which runs both
    # paths). Larger epochs keep the distributed path below.
    from last_minute_legends_spark.operators.dedup import LOCAL_EDGES_MAX

    rows = (new_edges.select("doc_a", "doc_b")
            .limit(LOCAL_EDGES_MAX + 1).collect())
    if len(rows) <= LOCAL_EDGES_MAX:
        edges = [(r.doc_a, r.doc_b) for r in rows]
        if all(a is not None and b is not None for a, b in edges):
            return _merge_local(spark, path, params, edges, write)
    return _merge_distributed(spark, path, params, new_edges, write)


def _merge_local(spark: SparkSession, path: str, params: dict,
                 edges: list, write: bool) -> DataFrame:
    """Driver-side contracted fold for an epoch-sized edge list: ONE
    corpus-sized job (the endpoint label lookup the fold semantically
    needs — the store is bucketed by cluster_id, so an id-keyed lookup
    cannot prune; identical in the distributed path), one tiny
    local-relation probe for the bucket routing (xxhash64 must come
    from the JVM so routing stays bit-identical to the store writes),
    and the same staged touched-buckets-only write. The union-find
    keeps min(root_a, root_b) on every merge, so each root is its
    component's min label by induction — connected_components'
    min-label invariant on the contracted graph."""
    from pyspark.sql.types import StructField, StructType

    n_buckets = params["n_buckets"]
    root = os.path.join(path, _LABELS)
    store = _store_df(spark, path, params)
    id_t = store.schema["id"].dataType
    cl_t = store.schema["cluster_id"].dataType

    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    ids_df = spark.createDataFrame(
        [(n,) for n in nodes], StructType([StructField("id", id_t)]))
    label = {r.id: r.cluster_id
             for r in store.join(F.broadcast(ids_df), "id")
             .select("id", "cluster_id").collect()}

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, r) != r:
            parent[x], x = r, parent[x]
        return r

    members = set()
    for a, b in edges:
        la = label.get(a, a)
        lb = label.get(b, b)
        if la == lb:
            continue
        members.add(la)
        members.add(lb)
        ra, rb = find(la), find(lb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    remap = {l: find(l) for l in members}
    remap = {l: r for l, r in remap.items() if l != r}
    fresh = [n for n in nodes if n not in label]

    # touched buckets: every merge-map key (old AND new — destinations
    # gain rows) plus the fresh singletons' pre-remap labels
    touch_labels = set(remap) | set(remap.values()) | set(fresh)
    if not touch_labels:
        return read_labels_store(spark, path)
    tl_df = spark.createDataFrame(
        [(l,) for l in sorted(touch_labels)],
        StructType([StructField("l", cl_t)]))
    touched = sorted({
        int(r.b) for r in
        tl_df.select(_lbk(F.col("l"), n_buckets).alias("b"))
        .distinct().collect()})

    remap_df = spark.createDataFrame(
        sorted(remap.items()),
        StructType([StructField("cluster_id", cl_t),
                    StructField("_new", cl_t)]))
    fresh_df = spark.createDataFrame(
        sorted((n, remap.get(n, n)) for n in fresh),
        StructType([StructField("id", id_t),
                    StructField("cluster_id", cl_t)]))
    in_touched = F.col("lbk").isin(touched)
    updated = (
        store.filter(in_touched)  # planning-time partition pruning
        .select("id", "cluster_id")
        .join(F.broadcast(remap_df), "cluster_id", "left")
        .select("id", F.coalesce("_new", "cluster_id").alias("cluster_id"))
        .unionByName(fresh_df)
    )
    if not write:
        # nothing persisted on this path: the merge map and fresh rows
        # are local relations, so the lazy result needs no
        # _ABSORB_PERSISTS bookkeeping
        return (store.filter(~in_touched).select("id", "cluster_id")
                .unionByName(updated))
    _stage_and_swap(spark, root, updated, touched, n_buckets)
    return read_labels_store(spark, path)


def _merge_distributed(spark: SparkSession, path: str, params: dict,
                       new_edges: DataFrame, write: bool) -> DataFrame:
    from last_minute_legends_spark.operators.dedup import (
        connected_components,
    )

    n_buckets = params["n_buckets"]
    root = os.path.join(path, _LABELS)
    store = _store_df(spark, path, params)

    nodes_new = (new_edges.select(F.col("doc_a").alias("id"))
                 .unionByName(new_edges.select(F.col("doc_b").alias("id")))
                 .distinct())
    # endpoint label lookup; nodes never seen before enter as their
    # own singletons and are flagged for insertion
    looked = (nodes_new.join(store.select("id", "cluster_id"),
                             "id", "left")
              .select("id",
                      F.coalesce("cluster_id", F.col("id"))
                      .alias("cluster_id"),
                      F.col("cluster_id").isNull().alias("_fresh"))
              .persist())
    la = looked.select(F.col("id").alias("doc_a"),
                       F.col("cluster_id").alias("la"))
    lb = looked.select(F.col("id").alias("doc_b"),
                       F.col("cluster_id").alias("lb"))
    contracted = (
        new_edges.join(la, "doc_a").join(lb, "doc_b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.least("la", "lb").alias("doc_a"),
                F.greatest("la", "lb").alias("doc_b"))
        .distinct()
    )
    merges = connected_components(contracted)
    remap = (merges.filter(F.col("id") != F.col("cluster_id"))
             .select(F.col("id").alias("cluster_id"),
                     F.col("cluster_id").alias("_new"))
             .persist())

    # the touched-bucket set: buckets of every merge-map key (old AND
    # new labels — destinations gain rows) plus the fresh singletons'
    # destination labels. Bounded by n_buckets after distinct — a
    # driver collect of at most K small ints, never row data.
    fresh = looked.filter(F.col("_fresh"))
    touch_labels = (remap.select(F.col("cluster_id").alias("l"))
                    .unionByName(remap.select(F.col("_new").alias("l")))
                    .unionByName(fresh.select(
                        F.col("cluster_id").alias("l"))))
    touched = sorted({
        int(r.b) for r in
        touch_labels.select(_lbk(F.col("l"), n_buckets).alias("b"))
        .distinct().collect()
    })
    if not touched:
        looked.unpersist()
        remap.unpersist()
        return read_labels_store(spark, path)

    in_touched = F.col("lbk").isin(touched)
    # fresh singleton rows, final label applied (their own id may have
    # been merged away in the same fold)
    fresh_rows = (fresh.join(F.broadcast(remap), "cluster_id", "left")
                  .select("id", F.coalesce("_new", "cluster_id")
                          .alias("cluster_id")))
    updated = (
        store.filter(in_touched)  # planning-time partition pruning
        .select("id", "cluster_id")
        .join(F.broadcast(remap), "cluster_id", "left")
        .select("id", F.coalesce("_new", "cluster_id").alias("cluster_id"))
        .unionByName(fresh_rows)
    )

    if not write:
        out = (store.filter(~in_touched).select("id", "cluster_id")
               .unionByName(updated))
        # the persisted frames back the LAZY result — register them
        # for the caller's post-materialization release (the absorb
        # append=False discipline, VERDICT r16 #6)
        from last_minute_legends_spark.operators.dedup_delta import (
            _ABSORB_PERSISTS,
        )
        _ABSORB_PERSISTS.extend([looked, remap])
        return out

    _stage_and_swap(spark, root, updated, touched, n_buckets)
    looked.unpersist()
    remap.unpersist()
    return read_labels_store(spark, path)


def _stage_and_swap(spark: SparkSession, root: str, updated: DataFrame,
                    touched: list, n_buckets: int) -> None:
    """Stage ONLY the touched buckets, then swap each directory in.
    Every updated row's destination bucket is itself touched (see
    module docstring), so the complement partitions need no staging
    and keep byte identity."""
    staging = f"{root}__merge_staged_{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    n_write = min(spark.sparkContext.defaultParallelism, n_buckets)
    (updated.withColumn("lbk", _lbk(F.col("cluster_id"), n_buckets))
     .repartition(n_write, F.col("lbk"))
     .sortWithinPartitions("lbk", "id")
     .write.partitionBy("lbk").mode("overwrite").parquet(staging))
    try:
        for b in touched:
            live = os.path.join(root, f"lbk={b}")
            src = os.path.join(staging, f"lbk={b}")
            old = f"{live}__old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(live):
                os.rename(live, old)
            if os.path.exists(src):
                os.rename(src, live)
            # a bucket can legitimately empty out (all its clusters
            # merged into other buckets): no staged dir → live stays
            # absent
            shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # refresh: the swap changed files under the read path
    spark.catalog.refreshByPath(root)
