#!/usr/bin/env python
"""ANN quality evaluation: recall@k of every approximate variant
against the exact brute-force top-k, plus wall time, at a given SF.

The recall TESTS (tests/) pin lower bounds; this tool produces the
full table for SCALE.md so the speed/recall trade of each index
family is documented with measured numbers, not adjectives.

Usage: python tools/ann_eval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    "ann_cosine_topk_matmul",
    "ann_lsh_signbit_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
]


def _pairs(df) -> dict[int, set[int]]:
    cols = df.columns
    qcol = "query_id" if "query_id" in cols else cols[0]
    ncol = "neighbor_id" if "neighbor_id" in cols else cols[1]
    out: dict[int, set[int]] = defaultdict(set)
    for r in df.collect():
        out[r[qcol]].add(r[ncol])
    return out


def _fixture_diagnosis(sf_dir: str) -> dict:
    """Why partition-based ANN recall saturates on THIS fixture: the
    true-neighbor structure is noise-driven (only ~6% of exact top-5
    neighbors share the query's label), so any coarse quantizer's
    recall tracks the scanned fraction almost linearly no matter how
    well the centroids are trained.  Measured here, not asserted."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"])
    labels = np.array(t["label"])
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qmask = ids % 50 == 0
    qids, Q = ids[qmask], Vn[qmask]
    sims = Q @ Vn.T
    same_label = 0
    truth = {}
    for i, qid in enumerate(qids):
        s = sims[i].copy()
        s[ids == qid] = -9.0
        top = np.argsort(-s)[:5]
        truth[int(qid)] = set(int(x) for x in ids[top])
        same_label += int((labels[top] == labels[ids == qid][0]).sum())

    def kmeans_recall(k, probes, iters):
        cm = np.array([V[0]])
        for _ in range(k - 1):
            d = np.min([((V - c) ** 2).sum(1) for c in cm], axis=0)
            cm = np.vstack([cm, V[int(np.argmax(d))]])
        for _ in range(iters):
            d = -2 * V @ cm.T + (cm * cm).sum(1)[None, :]
            lab = np.argmin(d, 1)
            for c in range(k):
                m = V[lab == c]
                if len(m):
                    cm[c] = m.mean(0)
        d = -2 * V @ cm.T + (cm * cm).sum(1)[None, :]
        lab = np.argmin(d, 1)
        hits = 0
        for i, qid in enumerate(qids):
            qv = V[ids == qid][0]
            probe = set(np.argsort(((cm - qv) ** 2).sum(1))[:probes])
            cand = set(int(x) for x in ids[np.isin(lab, list(probe))])
            hits += len(truth[int(qid)] & cand)
        return round(hits / (5 * len(qids)), 3)

    sweep = {
        f"k{k}_probe{p}": {"recall": kmeans_recall(k, p, 10),
                           "scan_frac": round(p / k, 2)}
        for k, p in [(10, 3), (16, 6), (10, 5), (16, 8)]
    }
    return {
        "same_label_frac_of_true_top5": round(same_label / (5 * len(qids)), 3),
        "ivf_recall_vs_scan_sweep": sweep,
        "conclusion": (
            "neighbor structure is isotropic-noise-driven; IVF recall ~ "
            "scanned fraction regardless of centroid quality.  IVF beats "
            "the exact matmul scan when (a) neighbors are cluster-aligned "
            "(see clustered_crossover) AND (b) the corpus exceeds what a "
            "full scan can stream per query batch — neither holds at this "
            "fixture's 2000x64."
        ),
    }


def _clustered_crossover(spark) -> dict:
    """IVF and PQ on a corpus whose neighbor structure IS
    cluster-aligned (strong signal, same 2000x64 shape): IVF recall at
    a 30% scan should be ~1.0, demonstrating the operators are sound
    and the driver fixture is the adversarial case.  The corpus comes
    from tools/clustered_fixture.py (the committed, reproducible
    generator — VERDICT r13 growth item)."""
    from form700_etl_spark.operators.similarity import ivf_topk, pq_topk
    from tools.clustered_fixture import exact_topk, make_clustered_embeddings

    V, _labels = make_clustered_embeddings()
    truth = exact_topk(V, k=5)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(len(V))]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    q = df.filter("vec_id % 50 = 0").selectExpr("vec_id AS query_id", "vec AS qvec")
    c = df.selectExpr("vec_id AS neighbor_id", "vec AS nvec")

    def recall(got_rows) -> float:
        by_q: dict = {}
        for r in got_rows:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(by_q.get(qid, set()) & t) for qid, t in truth.items())
        return round(hits / (5 * len(truth)), 3)

    ivf = ivf_topk(q, c, k=5, n_centroids=10, n_probe=3).collect()
    # PQ on clustered data exposes the textbook trade: 16-code
    # quantization captures the CLUSTER structure but collapses
    # within-cluster detail, so the shortlist samples the query's
    # ~200-member cluster — recall is bought with rerank budget
    # (measured r14: rerank 4/16/40 -> 0.125/0.395/1.0).
    pq_sweep = {
        f"rerank_{r}": recall(pq_topk(q, c, k=5, rerank=r).collect())
        for r in (4, 16, 40)
    }
    return {
        "corpus": "tools/clustered_fixture.py defaults (2000x64, 10 clusters, seed 7)",
        "ivf": {
            "params": {"n_centroids": 10, "n_probe": 3, "scan_frac": 0.3},
            "recall_at_5": recall(ivf),
        },
        "pq": {"recall_at_5_by_rerank": pq_sweep},
    }


def main() -> None:
    from form700_etl_spark.registry import all_queries
    from form700_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-eval")
    queries = all_queries()

    t0 = time.perf_counter()
    truth_df = queries["ann_cosine_topk_bruteforce"].fn(spark, sf_dir)
    truth = _pairs(truth_df)
    t_truth = time.perf_counter() - t0

    print("| variant | recall@k vs exact | sec (vs exact " f"{t_truth:.2f}s) |")
    print("|---|---|---|")
    artifact = {"sf_dir": sf_dir, "truth_sec": round(t_truth, 2), "variants": {}}
    for name in VARIANTS:
        start = time.perf_counter()
        approx = _pairs(queries[name].fn(spark, sf_dir))
        sec = time.perf_counter() - start
        hits = sum(len(approx[q] & truth[q]) for q in truth)
        total = sum(len(truth[q]) for q in truth)
        # LSH/PQ variants may return fewer neighbors per query (k=3 or
        # bucket-limited); recall is against the exact set truncated to
        # each variant's own k.
        k_var = max((len(v) for v in approx.values()), default=0)
        denom = sum(min(len(truth[q]), k_var) for q in truth)
        print(f"| {name} | {hits}/{denom} = {hits / max(denom, 1):.2f} | {sec:.2f} |")
        artifact["variants"][name] = {
            "recall": round(hits / max(denom, 1), 4),
            "hits": hits,
            "denom": denom,
            "k": k_var,
            "sec": round(sec, 2),
        }
    artifact["variants"]["ann_lsh_signbit_topk"]["note"] = (
        "multi-probe (Hamming radius 3, 93/256 buckets ~= 36% scan): "
        "recall lifted from the single-probe variant's 0.0 on this "
        "weakly-separated fixture (per-bit agreement ~0.62 at the true "
        "neighbors' ~0.37 cosine)"
    )
    artifact["fixture_diagnosis"] = _fixture_diagnosis(sf_dir)
    artifact["clustered_crossover"] = _clustered_crossover(spark)
    # Committed per-round artifact: the rows-only ANN family
    # (IVF/PQ/matmul/LSH) has no SQL oracle, so this JSON is its tracked
    # quality metric the way BENCH_r{N}.json tracks time — regressions
    # in recall show up as a diff, not a vibe (VERDICT r11 task 8).
    import json

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN_EVAL.json"
    )
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"# wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
