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
    # Known fixture artifact, annotated so a 0 doesn't read as a silent
    # regression: single-probe 8-bit sign-LSH over the weakly-clustered
    # 2k-vector fixture has ~2% expected collision recall at the true
    # neighbors' ~0.35 cosine (p = (1 - theta/pi)^8); the variant's
    # value is the bucket-prune SHAPE (search one bucket, exact rerank
    # inside), the scale path where corpora are large and multi-probe
    # raises recall.  Its exactness is oracle-checked; this table tracks
    # drift, and the IVF/PQ rows are the meaningful recall signals.
    artifact["variants"]["ann_lsh_signbit_topk"]["note"] = (
        "single-probe 8-bit LSH: ~2% expected recall on this fixture by "
        "design; tracked for drift, not quality"
    )
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
