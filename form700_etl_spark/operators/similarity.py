"""Similarity-search operator library (build plan M5).

Cosine math is double-precision end to end with a sequential fold so
results are reproducible bit-for-bit across engines (the oracle
recomputes them in DuckDB).  Ranking keys are rounded + id-tie-broken
for cross-partitioning determinism.

Scale design: the broadcast side is always the (small) query set; the
vector corpus is never shuffled for brute force — each partition
computes partial similarities and the top-k collapses via
TakeOrderedAndProject / window-per-query.  Bucketed variants (sign-bit
LSH here, learned IVF centroids in production) turn the O(Q·N) scan
into O(Q·N/buckets) with the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def vec_double(col: str | Column = "embedding") -> Column:
    """Promote a float32 vector to double BEFORE any arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column, round_to: int = 6) -> Column:
    return F.round(dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b)), round_to)


def signbit_bucket(col: str | Column = "embedding", bits: int = 8) -> Column:
    """Hyperplane-sign LSH bucket id from the signs of the first
    ``bits`` dimensions (stand-in for random projections / IVF)."""
    c = F.col(col) if isinstance(col, str) else col
    bucket = None
    for i in range(bits):
        term = F.when(c.getItem(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = term if bucket is None else (bucket + term)
    return bucket.cast("int")


def topk_neighbors(queries: DataFrame, corpus: DataFrame, k: int,
                   bucket_join: bool = False) -> DataFrame:
    """Top-k cosine neighbors per query.

    ``queries``: (query_id, qvec [, bucket]); ``corpus``:
    (neighbor_id, nvec [, nbucket]).  With ``bucket_join`` only
    same-bucket candidates are scanned.
    """
    cond = F.col("query_id") != F.col("neighbor_id")
    if bucket_join:
        cond = cond & (F.col("bucket") == F.col("nbucket"))
    joined = F.broadcast(queries).join(corpus, cond)
    sims = joined.withColumn("cosine", cosine(F.col("qvec"), F.col("nvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .drop("qvec", "nvec", "nbucket")
    )
