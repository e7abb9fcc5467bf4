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


# ------------------------------------------------- Hilbert curve key
#
# The Hilbert curve preserves locality strictly better than Morton
# order (no Z-shape jumps: consecutive keys are always grid
# neighbors), which is why Delta Lake's liquid clustering moved from
# Z-order to Hilbert.  xy2d is the classic iterative quadrant-rotation
# walk (Wikipedia/Warren, Hacker's Delight): per level s = 2^k..1,
# take quadrant bits (rx, ry), add s^2 * gray(rx, ry) to the key, and
# rotate/flip the frame.  The loop is a bounded fold over the bit
# levels — pure integer ops, identical in Spark's F.aggregate and
# DuckDB's list_reduce, so the key is oracle-checkable bit-for-bit.


def hilbert_key_sql(x_expr: str, y_expr: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB SQL computing the Hilbert d-index of (x, y) masked to
    ``bits`` bits, via list_reduce with [x, y, d] list state (list
    state, not struct: see timeseries_holt_linear's aliasing note)."""
    mask = (1 << bits) - 1
    svals = ", ".join(str(1 << k) for k in range(bits - 1, -1, -1))
    init = (
        f"[CAST(({x_expr}) & {mask} AS BIGINT),"
        f" CAST(({y_expr}) & {mask} AS BIGINT), CAST(0 AS BIGINT)]"
    )
    elems = (
        f"list_transform([{svals}], s -> [CAST(s AS BIGINT),"
        " CAST(0 AS BIGINT), CAST(0 AS BIGINT)])"
    )
    rx = "CASE WHEN (acc[1] & e[1]) > 0 THEN 1 ELSE 0 END"
    ry = "CASE WHEN (acc[2] & e[1]) > 0 THEN 1 ELSE 0 END"
    step = (
        "(acc, e) -> ["
        # x' : if ry=1 keep x, else swap in (possibly flipped) y
        f"CASE WHEN ({ry}) = 1 THEN acc[1]"
        f" ELSE CASE WHEN ({rx}) = 1 THEN e[1] - 1 - acc[2]"
        " ELSE acc[2] END END, "
        # y' : if ry=1 keep y, else swap in (possibly flipped) x
        f"CASE WHEN ({ry}) = 1 THEN acc[2]"
        f" ELSE CASE WHEN ({rx}) = 1 THEN e[1] - 1 - acc[1]"
        " ELSE acc[1] END END, "
        f"acc[3] + e[1] * e[1] * xor(3 * ({rx}), {ry})]"
    )
    return f"list_reduce([{init}] || {elems}, {step})[3]"


def hilbert_key(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Spark column computing the same Hilbert d-index via F.aggregate
    (same fold order and integer ops as the SQL twin)."""
    mask = (1 << bits) - 1

    def step(acc, s):
        x0, y0, d0 = acc[0], acc[1], acc[2]
        rx = F.when(x0.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y0.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        flip_x = F.when(rx == 1, s - 1 - y0).otherwise(y0)
        flip_y = F.when(rx == 1, s - 1 - x0).otherwise(x0)
        return F.array(
            F.when(ry == 1, x0).otherwise(flip_x),
            F.when(ry == 1, y0).otherwise(flip_y),
            d0 + s * s * (3 * rx).bitwiseXOR(ry),
        )

    levels = F.array(*[F.lit(1 << k).cast("long") for k in range(bits - 1, -1, -1)])
    init = F.array(
        x.cast("long").bitwiseAND(mask),
        y.cast("long").bitwiseAND(mask),
        F.lit(0).cast("long"),
    )
    return F.aggregate(levels, init, step)[2]
