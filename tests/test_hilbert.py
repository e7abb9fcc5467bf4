"""Laws for the Hilbert layout key (operators/zorder.py): exact match
with the reference xy2d walk, bijectivity, and the locality property
that motivates it over Morton order (consecutive keys are always grid
neighbors — Z-order jumps)."""

from __future__ import annotations


def _xy2d_ref(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_spark_fold_matches_reference_and_is_bijective(spark):
    from pyspark.sql import functions as F

    from form700_etl_spark.operators.zorder import hilbert_key

    n = 16
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
        )
        .select("x", "y", hilbert_key(F.col("x"), F.col("y"), bits=4).alias("d"))
        .collect()
    )
    ref = {(x, y): _xy2d_ref(n, x, y) for x in range(n) for y in range(n)}
    assert all(ref[(r["x"], r["y"])] == r["d"] for r in grid)
    assert sorted(r["d"] for r in grid) == list(range(n * n))


def test_hilbert_locality_beats_morton():
    """Walk d = 0..n^2-1: every Hilbert step moves exactly 1 in grid
    distance; Morton order takes jumps (its max step is >> 1)."""
    n = 16
    inv = {}
    for x in range(n):
        for y in range(n):
            inv[_xy2d_ref(n, x, y)] = (x, y)
    steps = []
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = inv[d - 1], inv[d]
        steps.append(abs(x1 - x0) + abs(y1 - y0))
    assert max(steps) == 1  # the Hilbert adjacency guarantee

    def morton(x, y):
        m = 0
        for b in range(4):
            m |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return m

    minv = {morton(x, y): (x, y) for x in range(n) for y in range(n)}
    msteps = [
        abs(minv[d][0] - minv[d - 1][0]) + abs(minv[d][1] - minv[d - 1][1])
        for d in range(1, n * n)
    ]
    assert max(msteps) > 1  # Z-order jumps; Hilbert does not
