#!/usr/bin/env python
"""IVF growth probe on the clustered corpus (VERDICT r14 task 8).

Measures `ann_ivf_topk`'s registry plan (10 centroids, 3-probe, exact
in-cluster rerank) at 1x/10x/30x the clustered fixture, recording for
each point: steady wall, recall vs exact top-5 (ground truth from
tools/clustered_fixture.exact_topk), the centroid-TRAINING sample the
driver actually collects (the bound that must NOT grow with the
corpus), and the probe fan-out (queries x n_probe broadcast entries).
Mirrors the dedup pipeline's 10x table in SCALE.md.

Usage: python tools/ivf_scale_probe.py [--sizes 2000,20000,60000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,20000,60000")
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from tools.clustered_fixture import (
        exact_topk,
        make_clustered_embeddings,
        write_fixture,
    )

    from form700_etl_spark.registry import all_queries
    from form700_etl_spark.session import get_spark

    spark = get_spark("ivf-scale-probe")
    q = all_queries()["ann_ivf_topk"]
    rows = []
    for n in sizes:
        vecs, labels = make_clustered_embeddings(n=n)
        d = tempfile.mkdtemp(prefix=f"ivf_probe_{n}_")
        try:
            write_fixture(d, vecs, labels)
            truth = exact_topk(vecs, k=args.k)
            # warm run compiles the plan; second run is the steady wall
            q.fn(spark, d).count()
            start = time.perf_counter()
            pred_rows = q.fn(spark, d).collect()
            wall = round(time.perf_counter() - start, 2)
            pred: dict[int, set[int]] = {}
            for r in pred_rows:
                pred.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
            n_q = len(truth)
            hit = sum(
                len(pred.get(qid, set()) & tr) for qid, tr in truth.items()
            )
            rows.append(
                {
                    "n": n,
                    "wall_s": wall,
                    "recall": round(hit / (args.k * n_q), 3),
                    "queries": n_q,
                    # the registry plan trains on min(n, 16384) vectors
                    # (kmeans_centroids train_sample) — the bound that
                    # stays CONSTANT past 16k corpus
                    "train_sample": min(n, 16_384),
                    # broadcast probe fan-out: one entry per (query,
                    # probed cluster); grows with QUERIES, not corpus
                    "probe_entries": n_q * 3,
                    "scan_fraction": 0.3,  # n_probe/n_centroids = 3/10
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
