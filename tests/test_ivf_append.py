"""Frozen-centroid index ingest (append_ivf_index): parity with a
fresh same-centroid build, byte-level non-destructiveness of the
append, and visibility of appended vectors in probe results. The
registry entry's extended unrolled-Lloyd oracle runs via
tests/test_oracle.py and the driver gate."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from last_minute_legends_spark.operators.similarity import (
    ivf_topk,
    train_centroids,
)
from last_minute_legends_spark.plans.ann_q import (
    IVF_ITERS,
    IVF_N_PROBE,
    N_CENTROIDS,
    N_QUERIES,
    TOP_K,
    _append_delta,
    _vectors,
    ann_ivf_append_probe,
)
from last_minute_legends_spark.sources.ivf_index import (
    append_ivf_index,
    probe_topk,
    write_ivf_index,
)


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


def test_append_probe_parity(spark, sf_dir, tmp_path):
    """probe_topk over write-then-append must equal the in-memory
    ivf_topk over base ∪ delta with the SAME frozen centroids — the
    append path changes storage, never semantics."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash

    vecs = _vectors(spark, sf_dir)
    base = vecs.filter(F.col("id") >= N_QUERIES)
    queries = vecs.filter(F.col("id") < N_QUERIES)
    delta = _append_delta(spark, sf_dir)
    centroids = train_centroids(base, k=N_CENTROIDS, iters=IVF_ITERS,
                                id_hash=md5_id_hash)

    idx = str(tmp_path / "idx")
    write_ivf_index(base, centroids, idx)
    append_ivf_index(spark, delta, idx)
    from_index = [tuple(r) for r in probe_topk(
        spark, idx, queries, k=TOP_K, n_probe=IVF_N_PROBE)
        .orderBy("q_id", "rn").collect()]
    in_memory = [tuple(r) for r in ivf_topk(
        queries, base.unionByName(delta), centroids,
        k=TOP_K, n_probe=IVF_N_PROBE).orderBy("q_id", "rn").collect()]
    assert from_index == in_memory


def test_append_never_rewrites(spark, sf_dir, tmp_path):
    """The ingest batch only ADDS files: every pre-append data file
    survives byte-identical (no rewrite, no compaction, no delete) —
    the property that keeps append cost ∝ batch size at 100 TB."""
    from last_minute_legends_spark.functions.portable_hash import md5_id_hash

    vecs = _vectors(spark, sf_dir)
    base = vecs.filter(F.col("id") >= N_QUERIES)
    centroids = train_centroids(base, k=N_CENTROIDS, iters=IVF_ITERS,
                                id_hash=md5_id_hash)
    idx = str(tmp_path / "idx")
    write_ivf_index(base, centroids, idx)
    before = _file_hashes(os.path.join(idx, "data"))
    append_ivf_index(spark, _append_delta(spark, sf_dir), idx)
    after = _file_hashes(os.path.join(idx, "data"))
    assert set(before) <= set(after)
    assert all(after[p] == h for p, h in before.items())
    assert len(after) > len(before)


def test_appended_vectors_probed(spark, sf_dir):
    """Appended near-dup twins of the query vectors must actually
    displace top-k results — a probe that silently missed the
    appended files would return only base ids."""
    from last_minute_legends_spark.sources.tables import Catalog

    max_base = Catalog(spark, sf_dir).embeddings.agg(
        F.max("vec_id")).collect()[0][0]
    got = ann_ivf_append_probe(spark, sf_dir).collect()
    assert any(r["c_id"] > max_base for r in got)
