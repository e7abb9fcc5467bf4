"""Fuzzy (edit-distance) string join — the record-linkage staple.

Joins two tables on approximate string equality (levenshtein distance
<= ``max_dist``) without the n² cross product:

- **blocking**: the equi-join key is the lowercased ``prefix_len``-char
  prefix, so Spark shuffles on an ordinary hash key; a length band
  (``abs(len(a) - len(b)) <= max_dist`` — a necessary condition for
  edit distance, so it costs recall nothing) prunes inside each block;
- **verify**: the exact ``levenshtein`` filter runs only on candidates
  that survived both, JVM-side (built-in expression, no UDF).

Prefix blocking is a *recall contract*, not an approximation bug: a
pair whose edit appears inside the first ``prefix_len`` characters is
not found — the same kind of declared tradeoff as LSH banding for
MinHash (raise ``prefix_len`` for selectivity, lower it for recall;
prefix-insensitive linkage belongs to the q-gram/PassJoin family,
Li et al., VLDB 2011).  The DuckDB oracle mirrors the exact same
blocking + verify, so cross-engine parity is cell-exact.

At 100 TB: the shuffle key is the prefix, so a hot prefix (every
"the ..." document title) is a skew key like any other — the standard
remedies apply (longer prefixes, salt-split hot blocks, or a
document-frequency cap as in ``operators.dedup.shingle``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(left: DataFrame, right: DataFrame, left_col: str, right_col: str,
               max_dist: int = 2, prefix_len: int = 3) -> DataFrame:
    """All (left, right) rows with ``levenshtein(left_col, right_col)
    <= max_dist`` whose lowercased ``prefix_len``-prefixes agree.
    Returns the joined rows plus a ``dist`` column."""
    lkey = F.lower(F.substring(F.col(left_col), 1, prefix_len))
    rkey = F.lower(F.substring(F.col(right_col), 1, prefix_len))
    lv = F.levenshtein(F.col(left_col), F.col(right_col))
    joined = left.join(
        right,
        (lkey == rkey)
        & (
            F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col)))
            <= max_dist
        ),
    )
    return joined.filter(lv <= max_dist).withColumn("dist", lv.cast("int"))
