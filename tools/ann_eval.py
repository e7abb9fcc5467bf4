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
    spark.stop()


if __name__ == "__main__":
    main()
