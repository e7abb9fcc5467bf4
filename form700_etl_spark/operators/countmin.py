"""Count-min sketch: mergeable frequency sketch for heavy-hitter
estimation (Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 2005).

The sketch is a D x W counter grid: each key increments one counter
per hash row, and a key's frequency estimate is the MIN of its D
counters (always >= the true count; collisions only inflate).  Here
the grid is a plain DataFrame of (d, bucket, c) rows, which makes the
two distributed properties free:

- **build** is one hash aggregation over (d, bucket) — fully parallel,
  no per-row Python;
- **merge** is element-wise counter addition, i.e. the same groupBy
  summed over shard sketches — so per-day/per-shard sketches roll up
  to any coarser grain without re-reading raw data (same storage story
  as the HLL sketches in ``sketches.py``; the mergeability law is
  asserted in tests).

Hashing is md5-hex so the estimate is bit-reproducible in any engine
with md5 (the DuckDB oracle recomputes the identical grid).  D hash
rows come from prefixing the row index: ``md5(d || '|' || key)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4  # hash rows; P(over-estimate by > eps) ~ exp(-DEPTH)
WIDTH = 256  # buckets per row: first two md5 hex digits


def _bucket(hash_col: Column) -> Column:
    """First two hex digits of an md5 column -> bucket 0..255."""
    return F.conv(F.substring(hash_col, 1, 2), 16, 10).cast("int")


def _hashed(df: DataFrame, key_col: str, depth: int) -> DataFrame:
    """(key, d, bucket) rows: each input row fans out to ``depth``
    (row, bucket) coordinates."""
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    rows = df.select(F.col(key_col).alias("key"), d)
    h = F.md5(F.concat_ws("|", F.col("d"), F.col("key")))
    return rows.select("key", "d", _bucket(h).alias("bucket"))


def countmin_build(df: DataFrame, key_col: str, depth: int = DEPTH) -> DataFrame:
    """Build the sketch: (d, bucket, c) counter rows.  At most
    depth x WIDTH rows regardless of input size — storable, mergeable."""
    return _hashed(df, key_col, depth).groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def countmin_merge(sketches: DataFrame) -> DataFrame:
    """Merge shard sketches (element-wise counter sum).  Input may carry
    extra shard columns; they are dropped by the re-aggregation."""
    return sketches.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                      depth: int = DEPTH) -> DataFrame:
    """Point-estimate each key: MIN over its D counters (0 when a
    counter row is absent).  Output: (key, cm_estimate)."""
    probes = _hashed(keys, key_col, depth)
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate"))
    )
