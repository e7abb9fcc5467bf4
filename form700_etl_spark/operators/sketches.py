"""Mergeable distributed sketches (Apache DataSketches HLL, bundled in
Spark as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Why sketches and not ``approx_count_distinct``: the SKETCH is a
first-class mergeable value.  At 100 TB you compute one sketch per
shard/day/partition ONCE, store the few-KB binaries, and answer any
later rollup (per week, per region, all-time) by unioning sketches —
no second pass over the data.  ``approx_count_distinct`` gives only
the final number; a new rollup means a new full scan.

The mergeability law  estimate(union(partials)) == estimate(whole)
is the distributed-correctness property, and is asserted in
``tests/test_functions.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 2^12 registers ≈ 2.5% relative error, ~4 KB per sketch


def hll_sketch(col: str | Column, lg_k: int = DEFAULT_LG_K) -> Column:
    """Aggregate expression: build one HLL sketch of ``col``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_agg(c, F.lit(lg_k))


def distinct_sketches(df: DataFrame, group_cols: list[str], value_col: str,
                      lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """Per-group HLL sketches of ``value_col`` — the shard-local pass.
    Output: group_cols + ``sketch`` (binary, few KB, storable)."""
    return df.groupBy(*group_cols).agg(hll_sketch(value_col, lg_k).alias("sketch"))


def rollup_sketches(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union pre-computed sketches up to a coarser grouping — the
    second-pass rollup that never touches raw data.  Output:
    group_cols + ``estimate`` (approx distinct count, long)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    )


def estimate(sketches: DataFrame, out_col: str = "estimate") -> DataFrame:
    """Read each sketch's estimate without merging."""
    return sketches.withColumn(out_col, F.hll_sketch_estimate("sketch"))
