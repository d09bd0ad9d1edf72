"""Bucket-partitioned cluster-labels store (operators/labels_store.py
— VERDICT r16 #1: make label maintenance epoch-sized END-TO-END):

- value contract: folding an epoch's edges must equal single-shot
  connected_components over the whole accumulated pair graph (the
  merge_cluster_labels contract the registry oracle re-checks
  cross-engine with a recursive CTE);
- I/O contract: the fold rewrites ONLY bucket directories holding a
  merge-map key — every file in an untouched bucket survives
  byte-for-byte, and a no-op epoch (already-connected edges,
  already-known nodes) touches ZERO buckets;
- crash/redelivery: re-folding the same epoch converges (confluent
  merges), and a dir stranded mid-swap self-heals on the next read.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from last_minute_legends_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from last_minute_legends_spark.operators.labels_store import (
    merge_labels_store,
    read_labels_store,
    recover_labels_store,
    write_labels_store,
)
from last_minute_legends_spark.sources.tables import Catalog

THRESHOLD = 0.8


def _labels(df) -> set:
    return {(r.id, r.cluster_id) for r in df.collect()}


def _file_hashes(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(
                    fh.read()).hexdigest()
    return out


def _edges(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_merge_semantics_synthetic(spark, tmp_path):
    """Cluster merge, new-node insertion, singleton passthrough, and
    min-id keeper election — against a hand-checkable graph."""
    path = str(tmp_path / "store")
    # clusters {1,2} and {5,6}; singleton 9
    base = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5), (9, 9)], "id long, cluster_id long")
    write_labels_store(base, path)

    # edge bridging the two clusters + a brand-new node 42 joining 9
    out = merge_labels_store(spark, path, _edges(spark, [(2, 6), (9, 42)]))
    assert _labels(out) == {(1, 1), (2, 1), (5, 1), (6, 1),
                            (9, 9), (42, 9)}
    # persisted state agrees with the returned frame
    assert _labels(read_labels_store(spark, path)) == _labels(out)


def test_merge_equals_full_cc_and_prunes_io(spark, sf_dir, tmp_path):
    """End-to-end on the real corpus: base labels from the base pair
    graph, fold the delta epoch's new edges, compare against
    single-shot CC over ALL pairs. Then the I/O contract: at least
    one bucket dir is untouched and every untouched file is
    byte-identical."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    base_docs = docs.filter(F.col("doc_id") % 5 != 0)
    base_pairs = minhash_lsh_pairs(base_docs, THRESHOLD).persist()
    all_pairs = minhash_lsh_pairs(docs, THRESHOLD).persist()
    new_edges = all_pairs.join(base_pairs.select("doc_a", "doc_b"),
                               ["doc_a", "doc_b"], "left_anti").persist()
    assert new_edges.count() > 0, "vacuous: the epoch must add edges"

    path = str(tmp_path / "store")
    write_labels_store(connected_components(base_pairs), path)
    h0 = _file_hashes(path)

    # read-only form first: must equal the full recompute
    expect = _labels(connected_components(all_pairs))
    ro = merge_labels_store(spark, path, new_edges, write=False)
    assert _labels(ro) == expect
    assert _file_hashes(path) == h0, "write=False must not mutate"

    # write form: same value, epoch-sized rewrite
    out = merge_labels_store(spark, path, new_edges, write=True)
    assert _labels(out) == expect
    h1 = _file_hashes(path)
    untouched = [f for f in h0 if f in h1 and h1[f] == h0[f]]
    assert untouched, "every bucket rewritten — pruning is broken"
    # byte identity is per-directory: a dir either survived whole or
    # was swapped whole
    changed_dirs = {os.path.dirname(f) for f in set(h0) ^ set(h1)} | {
        os.path.dirname(f) for f in h0 if f in h1 and h0[f] != h1[f]}
    for f in h0:
        if os.path.dirname(f) not in changed_dirs:
            assert h1.get(f) == h0[f]

    # redelivery: folding the SAME epoch again is a no-op — zero
    # bucket dirs change (confluence makes the retry safe without
    # epoch-versioned state)
    again = merge_labels_store(spark, path, new_edges, write=True)
    assert _labels(again) == expect
    assert _file_hashes(path) == h1
    for fr in (base_pairs, all_pairs, new_edges):
        fr.unpersist()


def test_empty_store_roundtrip_and_merge(spark, tmp_path):
    """A seed corpus with NO duplicate pairs yet yields an EMPTY
    store — zero partition dirs. The recorded schema must make reads
    work (UNABLE_TO_INFER_SCHEMA otherwise — hit at sf0.01 where the
    stream seed quarter has no intra-quarter pairs), and the first
    real epoch must fold into it."""
    path = str(tmp_path / "store")
    write_labels_store(
        spark.createDataFrame([], "id long, cluster_id long"), path)
    assert read_labels_store(spark, path).count() == 0
    out = merge_labels_store(spark, path, _edges(spark, [(2, 7)]))
    assert _labels(out) == {(2, 2), (7, 2)}
    assert _labels(read_labels_store(spark, path)) == {(2, 2), (7, 2)}


def test_noop_epoch_touches_zero_buckets(spark, tmp_path):
    path = str(tmp_path / "store")
    write_labels_store(spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, cluster_id long"), path)
    h0 = _file_hashes(path)
    out = merge_labels_store(spark, path, _edges(spark, [(1, 2)]))
    assert _labels(out) == {(1, 1), (2, 1)}
    assert _file_hashes(path) == h0


def test_stream_epoch_label_redelivery_converges(spark, sf_dir,
                                                 tmp_path):
    """The streaming sink's label fold under foreachBatch's
    at-least-once contract: delivering the SAME epoch twice must
    leave the store exactly at the single-fold state (second fold =
    all-no-op by confluence), and the final labels must equal
    single-shot connected_components over the full pair graph."""
    from last_minute_legends_spark.operators.dedup_delta import (
        stored_pairs, write_band_index,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        stream_absorb_epoch,
    )

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    e1 = docs.filter(F.col("doc_id") % 3 == 1)
    e2 = docs.filter(F.col("doc_id") % 3 == 2)
    idx = str(tmp_path / "idx")
    corpus = str(tmp_path / "corpus")
    labels = str(tmp_path / "labels")
    write_band_index(base, idx, THRESHOLD)
    base.write.mode("overwrite").parquet(corpus)
    write_labels_store(connected_components(stored_pairs(spark, idx)),
                       labels)

    stream_absorb_epoch(spark, e1, 1, idx, corpus, THRESHOLD,
                        labels_dir=labels)
    after_once = _labels(read_labels_store(spark, labels))
    h1 = _file_hashes(labels)
    # redelivery of the SAME epoch: a pure no-op on the store
    stream_absorb_epoch(spark, e1, 1, idx, corpus, THRESHOLD,
                        labels_dir=labels)
    assert _labels(read_labels_store(spark, labels)) == after_once
    assert _file_hashes(labels) == h1

    stream_absorb_epoch(spark, e2, 2, idx, corpus, THRESHOLD,
                        labels_dir=labels)
    expect = _labels(connected_components(
        minhash_lsh_pairs(docs, THRESHOLD)))
    assert _labels(read_labels_store(spark, labels)) == expect


def test_merge_lock_serializes_and_recovery_skips_live(spark, tmp_path):
    """Concurrency discipline (the band-index lessons, pre-empted):
    a write-fold against a store whose merge lock names a LIVE
    foreign owner refuses (interleaved bucket swaps would corrupt the
    labeling); probe-side recovery skips the apparent mid-swap state
    of a live fold; a DEAD owner's lock is stolen, its stale staging
    dir swept, and the fold proceeds."""
    import subprocess

    import pytest

    path = str(tmp_path / "store")
    write_labels_store(spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, cluster_id long"), path)
    root = os.path.join(path, "labels")

    proc = subprocess.Popen(["sleep", "60"])
    try:
        with open(f"{path}__merge.lock", "w") as fh:
            fh.write(str(proc.pid))
        with pytest.raises(RuntimeError, match="in flight"):
            merge_labels_store(spark, path, _edges(spark, [(1, 5)]))
        bucket = next(d for d in os.listdir(root)
                      if d.startswith("lbk="))
        os.rename(os.path.join(root, bucket),
                  os.path.join(root, bucket + "__old"))
        assert recover_labels_store(path) is False  # live fold: skip
        os.rename(os.path.join(root, bucket + "__old"),
                  os.path.join(root, bucket))
    finally:
        proc.kill()
        proc.wait()

    # dead owner: lock stolen, stale staging swept, fold proceeds
    with open(f"{path}__merge.lock", "w") as fh:
        fh.write(str(proc.pid))
    stale = os.path.join(path, f"labels__merge_staged_{proc.pid}")
    os.makedirs(stale)
    out = merge_labels_store(spark, path, _edges(spark, [(1, 5)]))
    assert _labels(out) == {(1, 1), (2, 1), (5, 1)}
    assert not os.path.exists(stale)
    assert not os.path.exists(f"{path}__merge.lock")


def test_recover_stranded_bucket_dir(spark, tmp_path):
    """A crash between the rename-out and rename-in of a bucket swap
    leaves ``lbk=<b>__old`` beside a missing live dir — the next read
    restores it."""
    path = str(tmp_path / "store")
    write_labels_store(spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5)], "id long, cluster_id long"), path)
    before = _labels(read_labels_store(spark, path))
    root = os.path.join(path, "labels")
    bucket = next(d for d in os.listdir(root)
                  if d.startswith("lbk=") and not d.endswith("__old"))
    os.rename(os.path.join(root, bucket),
              os.path.join(root, bucket + "__old"))
    assert recover_labels_store(path) is True
    assert _labels(read_labels_store(spark, path)) == before
