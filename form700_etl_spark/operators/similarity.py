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


def topk_neighbors_matmul(queries: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
    """Arrow-vectorized brute-force top-k: the query matrix broadcasts to
    every partition; each ``mapInPandas`` batch computes a numpy
    (batch × queries) similarity block and emits its partial top-k, then
    a per-query window keeps the global top-k.

    This is the genuine pandas-UDF fast path (BLAS matmul ≫ per-element
    expression eval for dense vectors).  numpy's pairwise summation
    differs from a sequential fold in the last ulps, so this variant is
    registered rows-only; tests assert neighbor-set agreement with the
    exact JVM plan.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select("query_id", "qvec").collect()
    q_ids = [r.query_id for r in q_rows]
    q_mat = np.array([r.qvec for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_norm))

    def block_topk(batches):
        ids, qn = bc.value
        for pdf in batches:
            n_mat = np.array(list(pdf["nvec"]), dtype=np.float64)
            n_mat = n_mat / np.linalg.norm(n_mat, axis=1, keepdims=True)
            sims = n_mat @ qn.T  # (batch, queries)
            out = []
            for qi, qid in enumerate(ids):
                col = sims[:, qi]
                take = min(k + 1, len(col))  # +1 in case self is in the batch
                idx = np.argpartition(-col, take - 1)[:take]
                for j in idx:
                    nid = int(pdf["neighbor_id"].iloc[j])
                    if nid != qid:
                        out.append((qid, nid, round(float(col[j]), 6)))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    partial = corpus.select("neighbor_id", "nvec").mapInPandas(
        block_topk, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


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
