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


# ------------------------------------------------------------------ KMV

KMV_K = 64  # k minimum values; relative error ~ 1/sqrt(k-2) ≈ 12.7%

# 48-bit uniform from the md5 hex prefix: 12 hex digits < 2^48, exact
# in a double and in a signed bigint, and computable bit-identically by
# any engine with md5 + string ops (no engine-specific hash needed —
# that's what makes the sketch itself oracle-able, unlike HLL whose
# register layout is implementation-defined).
KMV_HASH_BITS = 48


def kmv_hash(col: str | Column) -> Column:
    """Deterministic 48-bit integer hash of ``col`` (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("bigint")


def kmv_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = KMV_K) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct sketch (Bar-Yossef et
    al. 2002): the k smallest distinct hash values.  Output: group_cols
    + ``hashes`` (sorted array<bigint>, the mergeable sketch value).

    Mergeability: union partials' arrays, re-take the k smallest —
    asserted as a law test.  Unlike HLL the sketch content is exactly
    reproducible across engines, so estimates are oracle-checkable."""
    from pyspark.sql import Window as W

    h = df.select(*group_cols, kmv_hash(value_col).alias("h")).dropDuplicates(
        [*group_cols, "h"]
    )
    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("hashes"))
    )


def kmv_merge(sketches: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Merge KMV sketches up to a coarser grouping: concat arrays,
    distinct, keep the k smallest — no raw-data rescan."""
    exploded = sketches.select(*group_cols, F.explode("hashes").alias("h")).dropDuplicates(
        [*group_cols, "h"]
    )
    return kmv_from_hashes(exploded, group_cols, k)


def kmv_from_hashes(hashes: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("hashes"))
    )


def kmv_estimate(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per sketch: if the sketch holds fewer
    than k hashes the count is EXACT (= array size); otherwise
    (k-1)/u_k scaled from the 48-bit hash space (Beyer et al. 2007's
    unbiased KMV estimator)."""
    n = F.size("hashes")
    u_k = F.element_at("hashes", -1).cast("double") / F.lit(float(2 ** KMV_HASH_BITS))
    est = F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / u_k)
    return sketches.withColumn("estimate", F.round(est).cast("bigint")).drop("hashes")
