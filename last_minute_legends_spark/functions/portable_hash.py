"""Cross-engine portable hashing: the md5-prefix integer hash both
Spark and DuckDB compute bit-for-bit.

The production dedup/ANN operators hash with ``xxhash64`` — the
fastest JVM codegen path, but a function no second engine implements,
which forced their external checks to rows-only. These helpers build
the SAME 60-bit integer from the first 15 hex chars of md5 over a
deterministic string rendering, so a query parameterized with them
can be value-replayed by the driver's DuckDB gate (the ``*_replay``
registry entries in plans/dedup_q.py and plans/ann_q.py) and by
tests/test_hash_replay.py / tests/test_ivf_replay.py.

15 hex chars = 60 bits keeps the value non-negative in both engines'
signed 64-bit integers, so ``BIGINT::VARCHAR`` and Java's
``Long.toString`` render identically — which is what makes the
concatenated band keys comparable too.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_hash60(*cols) -> Column:
    """60-bit non-negative integer from the md5 of the ':'-joined
    string renderings of ``cols`` — same string, same digest, same
    integer on Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *cols)), 1, 15), 16, 10
    ).cast("long")


def md5_perm_hash(s: Column, i: int) -> Column:
    """Permutation-``i`` shingle hash (minhash replay injection)."""
    return md5_hash60(s, F.lit(str(i)))


def md5_word_hash(c: Column, w: int) -> Column:
    """Signature-word-``w`` token hash (wide-simhash replay)."""
    return md5_hash60(c, F.lit(str(w)))


def md5_id_hash(c: Column) -> Column:
    """Id hash over the decimal rendering (IVF seed-stripe replay)."""
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")


def concat_band_key(*cols) -> Column:
    """Band key as '|'-joined decimal renderings — Long.toString and
    BIGINT::VARCHAR agree for the non-negative md5_hash60 values."""
    return F.concat_ws("|", *[c.cast("string") for c in cols])


def duck_hash60(expr: str) -> str:
    """The DuckDB rendering of ``md5_hash60`` over a prebuilt string
    expression (callers join multi-part inputs with ':' themselves)."""
    return f"('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT"
