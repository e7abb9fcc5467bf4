"""Rank headline queries by driver-side plan-CONSTRUCTION time (r16 task 4).

The bench's timed runs pay `fn(spark, sf_dir)` — pure driver/py4j work —
before the first job is submitted, so a query whose builder loops over
Column objects shows up here.  Two passes per query in one warm session
(pass 2 avoids first-use costs: parquet footers, module imports); rank by
the SECOND pass, which is what a steady bench run pays.

Usage: python tools/planbuild_profile.py [sf_dir] [top_n]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from form700_etl_spark.registry import all_queries
from form700_etl_spark.session import get_spark
import bench

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

spark = get_spark("planbuild-profile")
queries = all_queries()
names = [n for n in bench.HEADLINE if n in queries]

rows = []
for name in names:
    fn = queries[name].fn
    try:
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        t1 = time.perf_counter()
        fn(spark, sf_dir)
        t2 = time.perf_counter()
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: ERROR {exc}")
        continue
    rows.append((name, t1 - t0, t2 - t1))

rows.sort(key=lambda r: -r[2])
print(f"{'query':45s} {'pass1_s':>8s} {'pass2_s':>8s}")
for name, p1, p2 in rows[:top_n]:
    print(f"{name:45s} {p1:8.3f} {p2:8.3f}")
print(f"total pass2 over {len(rows)} queries:",
      round(sum(r[2] for r in rows), 2), "s")
spark.stop()
