"""Custom aggregates (GROUPED_AGG pandas UDAFs).

NOTE: deliberately NO ``from __future__ import annotations`` here —
PySpark infers the UDAF kind from the *evaluated* type hints
(Series -> scalar = grouped aggregate), and stringified annotations
defeat that inference.
"""

from pandas import Series
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def cents_sum(v: Series) -> int:  # Series -> scalar = GROUPED_AGG
    """Exact integer-cents sum of a 2-decimal money column."""
    return int((v * 100).round().astype("int64").sum())
