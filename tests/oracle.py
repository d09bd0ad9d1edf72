"""DuckDB-oracle comparison harness mirroring the driver's t2 gate:
row-count + column names + order-insensitive value comparison.
"""

from __future__ import annotations

import math

import duckdb

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    try:
        import numpy as np
        import pandas as pd

        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            fv = float(v)
            return None if math.isnan(fv) else fv
        if v is pd.NaT:
            return None
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        # array-typed result columns: Spark's toPandas yields
        # numpy arrays, DuckDB yields lists — normalize both to
        # tuples so tuple equality compares by value
        if isinstance(v, (np.ndarray, list, tuple)):
            return tuple(_norm_value(x) for x in v)
    except ImportError:
        pass
    return v


def _norm_frame(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def compare(spark_df, oracle_df) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    issues: list[str] = []
    pdf = spark_df.toPandas()
    scols, srows = _norm_frame(pdf)
    ocols, orows = _norm_frame(oracle_df)
    if scols != ocols:
        issues.append(f"columns differ: spark={scols} oracle={ocols}")
        return issues
    if len(srows) != len(orows):
        issues.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            issues.append(f"row {i} differs:\n  spark={a}\n  oracle={b}")
            if len(issues) > 5:
                break
    return issues
