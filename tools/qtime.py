#!/usr/bin/env python
"""Isolated per-query steady-state timer (round-15 session tool).

Usage: python tools/qtime.py [--runs N] [--sf DIR] q1 q2 ...

Times each named registry query with the SAME methodology as bench.py
(.count() on the result, best-of-N after one untimed warm run), in one
Spark session, printing per-run walls so host noise is visible.  Prints
1-min loadavg before/after each query for adjudication.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from form700_etl_spark.registry import all_queries
from form700_etl_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    queries = all_queries()
    spark = get_spark("qtime")
    for name in names:
        fn = queries[name].fn
        spark.sparkContext.setJobDescription(f"qtime:{name}:warm")
        t0 = time.time()
        fn(spark, sf_dir).count()
        cold = time.time() - t0
        walls = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}:run{r}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
        load1 = os.getloadavg()[0]
        print(
            f"QTIME {name} cold={cold:.2f} best={min(walls):.2f} "
            f"runs={[round(w, 2) for w in walls]} load1={load1:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
