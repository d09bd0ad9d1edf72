"""Price extraction from composite price strings.

Reference parity: the batch processor parses movie prices like
``899USD$8.99`` with a per-row Python UDF
(/root/reference/services/spark_batch_processor.py:50-66). Here the
same semantics are a native ``regexp_extract`` — JVM-side, in
whole-stage codegen, ~100× the throughput of a Python UDF at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# trailing "$<decimal>" → the decimal part
PRICE_RE = r"\$(.+)$"


def extract_trailing_price(col: Column) -> Column:
    """``'899USD$8.99'`` → 8.99 (double); no match → NULL."""
    return F.regexp_extract(col, PRICE_RE, 1).cast("double")


def compose_price_string(price: Column) -> Column:
    """Build the reference's composite format from a numeric price:
    ``<cents>USD$<price>`` (used to exercise the extractor on the
    driver's ``part`` table without synthesizing external files)."""
    cents = F.round(price * 100, 0).cast("bigint").cast("string")
    return F.concat(cents, F.lit("USD$"), price.cast("string"))
