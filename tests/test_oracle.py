"""Every SQL-expressible SURVEY §2 query vs its DuckDB oracle —
the same gate the driver applies (rows + schema + values).
Rows-only queries are checked for successful execution and
deterministic row counts across two runs.
"""

import pytest

import __spark_entry__ as entry_mod
from last_minute_legends_spark.plans.queries import LOCAL_ORACLE_SQL
from tests.oracle import compare, run_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

SQL_KEYS = sorted(k for k in QUERIES if k in ORACLES)
# Entries past the driver's 50-entry window that still have a DuckDB
# oracle get the full value-level check here (driver sees rows-only).
LOCAL_SQL_KEYS = sorted(k for k in QUERIES if k in LOCAL_ORACLE_SQL)
ROWS_ONLY_KEYS = sorted(
    k for k in QUERIES if k not in ORACLES and k not in LOCAL_ORACLE_SQL)


@pytest.mark.parametrize("name", SQL_KEYS)
def test_oracle_match(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    odf = run_oracle(ORACLES[name], sf_dir)
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "\n".join(issues)


@pytest.mark.parametrize("name", LOCAL_SQL_KEYS)
def test_local_oracle_match(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    odf = run_oracle(LOCAL_ORACLE_SQL[name], sf_dir)
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "\n".join(issues)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n1 = df.count()
    n2 = QUERIES[name](spark, sf_dir).count()
    assert n1 == n2, f"{name}: nondeterministic row count {n1} != {n2}"
    assert n1 >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
