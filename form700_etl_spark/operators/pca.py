"""Distributed PCA via one-pass Gram accumulation.

The scalable shape (tall-skinny X, d << n): executors reduce each Arrow
batch to the algebraic partials ``(count, sum_vec, X^T X)`` — d + d^2
floats regardless of row count — the driver merges the handful of
partition partials, eigendecomposes the d x d covariance (d=64 here;
trivial even at d=4096), and broadcasts the top-k basis back for a
scan-side projection.  Two passes over the data, no shuffle wider than
the d^2 partials, no row ever collected.

Sign convention: eigenvectors are defined up to sign, so each component
is flipped to make its largest-|coefficient| entry positive — making
the projection deterministic across runs and partitionings (same
convention as scikit-learn's ``svd_flip``).

The exact-integer covariance that the oracle checks lives in
queries/mlprep.py (embedding_pca_covariance); this operator uses float
partials because eigendecomposition is itself float — determinism comes
from the fixed merge order of the (few) partition partials plus the
sign fix, verified by tests/test_pca.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),  # flattened d x d Gram
    ]
)


def _gram_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    n, s, g = 0, None, None
    for pdf in batches:
        x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        n += x.shape[0]
        s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
        gram = x.T @ x
        g = gram if g is None else g + gram
    if n:
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})


def pca_components(df: DataFrame, k: int = 2) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on ``df.embedding``; return (mean, components[k,d], eigvals[k]).

    One distributed pass producing d+d^2-float partials per partition;
    the driver merges partials in a deterministic (sorted) order and
    runs ``numpy.linalg.eigh`` on the d x d covariance.
    """
    rows = (
        df.select("embedding")
        .mapInPandas(_gram_partials, schema=_PARTIAL_SCHEMA)
        .collect()
    )
    if not rows:
        raise ValueError("pca_components: empty input")
    # deterministic merge order regardless of task completion order —
    # the key must be TOTAL: (n, s[0]) alone can collide (two partitions
    # with equal row count and first-coordinate sum would fall back to
    # nondeterministic collect order and change float summation order),
    # so sort on the full partial-sum tuple.
    rows = sorted(rows, key=lambda r: (r["n"], tuple(r["s"]), tuple(r["g"])))
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T  # (k, d)
    # svd_flip-style sign fix: largest-|coeff| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals[order]


def pca_project(df: DataFrame, k: int = 2, id_col: str = "vec_id") -> DataFrame:
    """Project ``df.embedding`` onto the top-k principal components.

    Returns (id_col, pc1..pck, label if present).  The k x d basis and
    d-vector mean broadcast with the closure; projection is one
    Arrow-batched matmul per partition — linear scan, no shuffle.
    """
    mean, comps, _ = pca_components(df, k=k)
    out_cols = [f"pc{i + 1}" for i in range(k)]
    keep = [id_col] + (["label"] if "label" in df.columns else [])
    schema = StructType(
        [df.schema[c] for c in keep]
        + [StructField(c, DoubleType()) for c in out_cols]
    )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = (x - mean) @ comps.T  # (n, k)
            out = pdf[keep].copy()
            for i, c in enumerate(out_cols):
                # round to 1e-9: the partial-merge order is fixed, but
                # rounding keeps the output stable against BLAS kernel
                # choice inside one machine's run
                out[c] = np.round(proj[:, i], 9)
            yield out

    return df.select(*keep, "embedding").mapInPandas(project, schema=schema).select(
        *keep, *out_cols
    )
