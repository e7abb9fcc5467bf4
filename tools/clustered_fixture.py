#!/usr/bin/env python
"""Clustered embedding fixture generator (VERDICT r13 growth item).

The driver-generated ``embeddings.parquet`` is isotropic noise: its
exact-top-k neighbor structure is noise-driven (~6% label agreement,
see ANN_EVAL.json fixture_diagnosis), which is the ADVERSARIAL case for
any partition-based ANN index — recall tracks scanned fraction nearly
linearly no matter how well centroids are trained.  Real embedding
corpora are clustered; that is the regime IVF/PQ are built for.  This
module makes that regime reproducible in-repo: a deterministic
generator with the SAME schema as the driver fixture
(vec_id int64, embedding list<float>, label int32), usable as a drop-in
``sf_dir`` for any registry embedding query, by ann_eval's crossover
measurement, and by the recall lower-bound tests.

Model: ``n_clusters`` Gaussian centers at separation ``spread`` with
per-point noise ``noise`` — signal-to-noise spread/noise controls how
cluster-aligned the true top-k structure is (spread 3.0 / noise 0.4
gives ~100% label agreement at 2000x64; the driver fixture is the
spread→0 limit).

Usage:
    python tools/clustered_fixture.py OUT_DIR [--n 2000] [--dim 64]
        [--clusters 10] [--noise 0.4] [--spread 3.0] [--seed 7]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clustered_embeddings(
    n: int = 2000,
    dim: int = 64,
    n_clusters: int = 10,
    noise: float = 0.4,
    spread: float = 3.0,
    seed: int = 7,
):
    """Returns (vectors float64 [n, dim], labels int [n]) — label i%k,
    deterministic for a given seed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * spread
    labels = np.arange(n) % n_clusters
    vecs = centers[labels] + rng.normal(size=(n, dim)) * noise
    return vecs, labels


def exact_topk(vecs, k: int = 5) -> dict[int, set[int]]:
    """Ground-truth cosine top-k (self excluded) for every 50th vector
    — the query convention all ANN eval code in this repo uses."""
    import numpy as np

    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qids = np.flatnonzero(np.arange(len(vecs)) % 50 == 0)
    sims = vn[qids] @ vn.T
    truth: dict[int, set[int]] = {}
    for i, qid in enumerate(qids):
        s = sims[i].copy()
        s[qid] = -9.0
        truth[int(qid)] = set(int(x) for x in np.argsort(-s)[:k])
    return truth


def write_fixture(out_dir: str, vecs, labels) -> str:
    """Writes ``embeddings.parquet`` with the driver fixture's schema;
    the directory then works as sf_dir for embedding queries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array((int(x) for x in labels), type=pa.int32()),
        }
    )
    pq.write_table(table, path)
    return path


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=10)
    ap.add_argument("--noise", type=float, default=0.4)
    ap.add_argument("--spread", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    vecs, labels = make_clustered_embeddings(
        args.n, args.dim, args.clusters, args.noise, args.spread, args.seed
    )
    path = write_fixture(args.out_dir, vecs, labels)
    print(f"wrote {path}: {args.n}x{args.dim}, {args.clusters} clusters")


if __name__ == "__main__":
    main()
