"""Law tests for the distributed PCA operator (operators/pca.py).

The projection has no SQL oracle (eigendecomposition), so correctness
rests on the algebraic laws a PCA must satisfy plus a numpy
ground-truth comparison on the same data.
"""

from __future__ import annotations

import numpy as np

from form700_etl_spark.io import table
from form700_etl_spark.operators.pca import pca_components, pca_project


def _load_np(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_components_orthonormal_and_ordered(spark, sf_dir):
    mean, comps, eigvals = pca_components(
        table(spark, sf_dir, "embeddings"), k=4
    )
    # orthonormal basis
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    # eigenvalues descending and non-negative
    assert np.all(np.diff(eigvals) <= 1e-12)
    assert np.all(eigvals >= -1e-12)
    # sign convention: largest-|coeff| entry positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_matches_numpy_ground_truth(spark, sf_dir):
    x = _load_np(spark, sf_dir)
    mean, comps, eigvals = pca_components(
        table(spark, sf_dir, "embeddings"), k=2
    )
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = np.argsort(w)[::-1][:2]
    assert np.allclose(sorted(eigvals), sorted(w[top]), atol=1e-9)
    # spans agree: each distributed component lies in the numpy top-2
    # eigenspace (|projection onto the span| == 1)
    span = v[:, top]
    for row in comps:
        assert abs(np.linalg.norm(span.T @ row) - 1.0) < 1e-6


def test_projection_variance_matches_eigvals(spark, sf_dir):
    df = table(spark, sf_dir, "embeddings")
    _, _, eigvals = pca_components(df, k=2)
    proj = pca_project(df, k=2).toPandas()
    assert np.allclose(proj["pc1"].var(ddof=0), eigvals[0], atol=1e-6)
    assert np.allclose(proj["pc2"].var(ddof=0), eigvals[1], atol=1e-6)
    # components uncorrelated in projection space
    assert abs(np.cov(proj["pc1"], proj["pc2"], bias=True)[0, 1]) < 1e-6


def test_projection_deterministic_across_partitionings(spark, sf_dir):
    df = table(spark, sf_dir, "embeddings")
    a = pca_project(df, k=2).toPandas().sort_values("vec_id").reset_index(drop=True)
    b = (
        pca_project(df.repartition(7), k=2)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.allclose(a["pc1"], b["pc1"], atol=1e-8)
    assert np.allclose(a["pc2"], b["pc2"], atol=1e-8)


def test_power_iteration_captures_top_eigenvalue(spark, sf_dir):
    """The distributed power-iteration direction must capture >= 92% of
    the top eigenvalue's variance (Rayleigh quotient vs eigh lambda_max).
    The fixture spectrum is near-degenerate, so cosine-to-one-eigenvector
    is ill-posed — RQ capture is the well-posed convergence law."""
    import numpy as np

    from form700_etl_spark.io import table
    from form700_etl_spark.registry import all_queries

    X = np.array(
        [
            r["embedding"]
            for r in table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    xq = np.round(X * 1000)
    n = len(xq)
    Y = n * xq - xq.sum(0)
    C = Y.T @ Y
    lam_max = np.linalg.eigvalsh(C)[-1]
    rows = (
        all_queries()["embedding_power_iteration_top_pc"]
        .fn(spark, sf_dir)
        .collect()
    )
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    v = v / np.linalg.norm(v)
    assert v @ C @ v >= 0.92 * lam_max, (v @ C @ v) / lam_max
