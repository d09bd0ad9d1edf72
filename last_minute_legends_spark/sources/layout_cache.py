"""Write-once derived-layout cache.

The write-time layouts (date-partitioned facts, the IVF bucket index)
are worth their build cost only if built ONCE per corpus and reused by
every subsequent query — on a cluster that lifecycle lives in the
metastore; here it is a local directory keyed by a fingerprint of the
source parquet (absolute path + per-file size + mtime_ns, recursive,
plus a layout version), so regenerating the corpus in place, or
changing the layout code, invalidates the cache instead of serving
stale data.

The cache root is PER-USER and mode 0700 (``SPARK_GRAFT_LAYOUT_CACHE``
overrides it): a shared world-writable tmpdir keyed only by an md5
fingerprint would let another user on a multi-user host pre-create the
fingerprint directory and poison the cache with attacker-controlled
parquet (or break it with permission failures). A root owned by
someone else fails loudly instead of being silently trusted.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

_DONE = "_LAYOUT_DONE"
_ENV_ROOT = "SPARK_GRAFT_LAYOUT_CACHE"

# In-process build-vs-hit accounting per layout namespace (VERDICT r17
# honesty item: a cached layout moves its build cost OUT of the cells
# that read it, so the bench diag must record, per cell, whether a
# layout was BUILT inside the timed window or served as a hit — a
# reviewer can then separate measurement-boundary moves from real
# speedups mechanically). bench.py snapshots this around every cell.
STATS: dict[str, dict] = {}


def _stat(path: str) -> dict:
    ns = os.path.basename(os.path.dirname(path)) or path
    return STATS.setdefault(ns, {"hits": 0, "builds": 0, "build_sec": 0.0})


def cache_root() -> str:
    """Per-user 0700 cache root, created on first use. Honors
    ``SPARK_GRAFT_LAYOUT_CACHE``; otherwise
    ``$TMPDIR/spark_graft_layouts_uid<uid>``. Refuses a pre-existing
    root owned by another user — that is exactly the poisoning/
    permission-failure scenario the per-user scoping exists to stop."""
    root = os.environ.get(_ENV_ROOT)
    if not root:
        uid = os.getuid() if hasattr(os, "getuid") else 0
        root = os.path.join(tempfile.gettempdir(),
                            f"spark_graft_layouts_uid{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    if hasattr(os, "getuid") and os.stat(root).st_uid != os.getuid():
        raise RuntimeError(
            f"layout cache root {root!r} is owned by uid "
            f"{os.stat(root).st_uid}, not the current user "
            f"({os.getuid()}) — refusing to trust or write derived "
            f"layouts there; set {_ENV_ROOT} to a directory you own")
    os.chmod(root, 0o700)
    return root


def source_fingerprint(table_path: str, version: str) -> str:
    """md5 over (layout version, abspath, every file's relative path +
    size + mtime_ns) — RECURSIVE, so a nested source layout (e.g. a
    partitioned table whose leaf files are rewritten in place)
    invalidates like a flat one does."""
    parts = [version, os.path.abspath(table_path)]
    if os.path.isfile(table_path):
        files = [table_path]
    else:
        files = []
        for d, dirs, names in os.walk(table_path):
            dirs.sort()
            files.extend(os.path.join(d, f) for f in sorted(names))
    for f in files:
        st = os.stat(f)
        rel = os.path.relpath(f, table_path)
        parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]


def layout_dir(namespace: str, table_path: str, version: str) -> str:
    """Cache directory for one derived layout of one source table."""
    return os.path.join(cache_root(), namespace,
                        source_fingerprint(table_path, version))


def is_built(path: str) -> bool:
    return os.path.exists(os.path.join(path, _DONE))


def mark_built(path: str) -> None:
    open(os.path.join(path, _DONE), "w").close()


def build_once(path: str, build) -> str:
    """Concurrency-safe write-once build: ``build(tmp_dir)`` writes
    the layout into a PROCESS-UNIQUE staging directory (sibling of
    ``path``, same filesystem), which is then atomically renamed to
    ``path``.

    The bare is_built/mark_built pair this replaces at call sites had
    a race (ADVICE r14): two processes (e.g. pytest and bench) both
    observing an unbuilt fingerprint would both write
    ``mode("overwrite")`` into the SAME directory while the other was
    already hardlinking files out of it — a partial layout for one of
    them. With rename-into-place, concurrent builders each produce a
    complete private layout and exactly one rename wins; the loser
    sees the winner's ``_LAYOUT_DONE`` and discards its own copy.
    Readers never observe a directory that exists-but-is-partial,
    because ``path`` only comes into existence complete."""
    import shutil
    import time
    import uuid

    if is_built(path):
        _stat(path)["hits"] += 1
        return path
    t0 = time.perf_counter()
    tmp = f"{path}__build_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        build(tmp)
        mark_built(tmp)
        s = _stat(path)
        s["builds"] += 1
        s["build_sec"] = round(s["build_sec"]
                               + (time.perf_counter() - t0), 3)
        try:
            os.rename(tmp, path)
        except OSError:
            if not is_built(path):
                # a DONE-less existing path is a STALE PARTIAL (a
                # crashed build from the pre-build_once scheme, or
                # litter) — without this it blocks every future build
                # with ENOTEMPTY until someone deletes it by hand
                # (ADVICE r15). Remove it and retry the rename once;
                # if a racing builder completed in between, its DONE
                # layout serves and ours is discarded as usual.
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(tmp, path)
                except OSError:
                    if not is_built(path):
                        raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return path
