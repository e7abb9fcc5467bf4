"""Exact money arithmetic across engines.

The fixture money columns are doubles carrying 2-decimal values (the
nearest-double of e.g. 914.44).  Summing doubles is order-dependent, so
a Spark aggregate and a DuckDB aggregate can disagree in the last few
ulps — enough to break an exact value-hash comparison.  The fix is the
classic fixed-point trick: convert to integer cents once
(``round(x * 100)`` — the double multiply and half-up round are
deterministic and identical in both engines for 2-decimal data),
aggregate exactly in BIGINT, and divide back to double once at the end
(exact below 2^53).

This is also the *fast* path at 100 TB: BIGINT sums are cheaper than
DECIMAL sums and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """double money value -> exact integer cents (BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def money(cents_col: Column) -> Column:
    """exact integer cents (BIGINT) -> double money value."""
    return (cents_col.cast("double") / F.lit(100.0))


def cents_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`cents`."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def money_sql(cents_expr: str) -> str:
    """DuckDB-side mirror of :func:`money`."""
    return f"(CAST({cents_expr} AS DOUBLE) / 100.0)"
