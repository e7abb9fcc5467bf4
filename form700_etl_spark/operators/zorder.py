"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Parquet readers prune row groups / files whose column min-max stats
don't overlap the query predicate.  A layout sorted on ONE column only
skips on that column; interleaving the bits of several columns into a
single Morton key and range-partitioning + sorting on it keeps files
tight in EVERY keyed dimension at once, so 2-D box predicates skip in
both — the technique behind Delta/Iceberg table Z-ORDER OPTIMIZE,
expressed here with nothing but public integer expressions, so both
the Spark plan and the DuckDB oracle compute bit-identical keys.

The key is a pure projection (no shuffle, inside whole-stage codegen);
the layout write is one range repartition + in-partition sort — the
same cost as any global sort, paid once at write time and amortized by
every subsequent skipping scan.  At 100 TB the write would target
file-sized range partitions; locally the file count is a parameter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zorder_key_sql(col_exprs: list[str], bits: int = DEFAULT_BITS) -> str:
    """SQL expression interleaving the low ``bits`` bits of each input
    expression (engine-portable: BIGINT shifts/AND/OR only).  Inputs are
    masked to ``bits`` bits first, so out-of-range values degrade to
    coarser clustering, never to wrong results — the key only orders the
    layout; correctness always comes from the scan predicate itself.
    ``len(col_exprs) * bits`` must stay below 63.
    """
    n = len(col_exprs)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds the 62-bit key budget")
    mask = (1 << bits) - 1
    masked = [f"(CAST(({e}) AS BIGINT) & {mask})" for e in col_exprs]
    terms = [
        f"((({m} >> {b}) & 1) << {b * n + c})"
        for c, m in enumerate(masked)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_key(col_exprs: list[str], bits: int = DEFAULT_BITS) -> Column:
    return F.expr(zorder_key_sql(col_exprs, bits))


def zorder_write(
    df: DataFrame,
    col_exprs: list[str],
    path: str,
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    key of ``col_exprs``: range-repartition on the key (contiguous key
    ranges per file → tight per-file min-max stats on every keyed
    column), sort within partitions (tight row-group stats too), drop
    the helper key before writing."""
    keyed = df.withColumn("__zkey", zorder_key(col_exprs, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
