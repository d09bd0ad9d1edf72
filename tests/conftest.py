import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from last_minute_legends_spark.session import get_spark

    s = get_spark("llm-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True, scope="module")
def _drain_context_cleaner_backlog():
    """Force a JVM GC between test modules: Spark's ContextCleaner
    frees accumulated broadcast/shuffle blocks only when a GC
    collects their weak references, and the one session-scoped local
    JVM otherwise accumulates the whole suite's backlog (measured in
    bench.py: identical cells run up to 4x slower late in a shared
    JVM; per-cell GC returns them to fresh-JVM times)."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.sparkContext._jvm.System.gc()
