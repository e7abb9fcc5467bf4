#!/usr/bin/env python
"""Cross-engine spot check at an arbitrary scale factor.

The oracle suite runs at sf0.001 (pytest) and sf0.01 (driver); this
tool replays the same comparison at any SF for any query subset — the
round ritual uses it at sf0.01 and sf0.1, where float-path bugs that
small fixtures cannot expose (the round-4 interpolation FMA ulp, the
round-10 -0.0-vs-+0.0 modularity escape) have been caught before.

The comparator is tests/oracle_harness.compare — repr-level exact on
every cell, floats included, so it distinguishes -0.0 from +0.0 and
1e-9 from 0.0 exactly like the driver's value hash.  (Until round 11
this file used pandas assert_frame_equal with its default rtol=1e-5,
which is precisely the window where the modularity escape hid.)

Usage:
    python tools/crosscheck.py sf_dir [query ...]
    python tools/crosscheck.py /root/testdata/sf0.1 bloom_join_building_orders
    python tools/crosscheck.py /root/testdata/sf0.1 --all   # every oracle query
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from form700_etl_spark.registry import all_queries
    from form700_etl_spark.session import get_spark
    from tests.oracle_harness import compare, duckdb_connection

    sf_dir = sys.argv[1]
    queries = all_queries()
    if "--all" in sys.argv[2:]:
        names = [n for n, q in sorted(queries.items()) if q.oracle]
    else:
        names = [n for n in sys.argv[2:] if not n.startswith("--")]

    spark = get_spark("crosscheck")
    con = duckdb_connection(sf_dir)
    failures = []
    for name in names:
        q = queries[name]
        if q.oracle is None:
            # no SQL oracle (approx/float-path op): run it and report the
            # row count so the artifact still proves it executes at this SF
            start = time.perf_counter()
            try:
                n = q.fn(spark, sf_dir).count()
                print(f"{name}: ROWS-ONLY rows={n} ({time.perf_counter() - start:.1f}s)")
            except Exception as exc:  # noqa: BLE001 — report and continue
                failures.append(name)
                print(f"{name}: FAIL {str(exc)[:400]}")
            continue
        start = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            compare(df, con, q.oracle, name=name)
            print(f"{name}: OK ({time.perf_counter() - start:.1f}s)")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"{name}: FAIL {str(exc)[:400]}")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print(f"\nall {len(names)} green at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
