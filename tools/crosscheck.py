#!/usr/bin/env python
"""Cross-engine spot check at an arbitrary scale factor.

The oracle suite runs at sf0.001 (pytest) and sf0.01 (driver); this
tool replays the same cell-exact comparison at any SF for any query
subset — the round ritual uses it at sf0.1, where float-path bugs
that small fixtures cannot expose (e.g. the round-4 interpolation FMA
ulp) have been caught before.

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
    import duckdb
    import pandas as pd

    from form700_etl_spark.io import TABLE_NAMES
    from form700_etl_spark.registry import all_queries
    from form700_etl_spark.session import get_spark

    sf_dir = sys.argv[1]
    queries = all_queries()
    if "--all" in sys.argv[2:]:
        names = [n for n, q in sorted(queries.items()) if q.oracle]
    else:
        names = sys.argv[2:]

    spark = get_spark("crosscheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
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
            a = q.fn(spark, sf_dir).toPandas()
            e = con.execute(q.oracle).df()
            cols = sorted(a.columns)
            assert cols == sorted(e.columns), f"columns {cols} vs {sorted(e.columns)}"
            a = a[cols].sort_values(cols).reset_index(drop=True)
            e = e[cols].sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, e, check_dtype=False)
            print(f"{name}: OK rows={len(a)} ({time.perf_counter() - start:.1f}s)")
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
