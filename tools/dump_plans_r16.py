#!/usr/bin/env python
"""Dump .explain("formatted") for the round-15-touched queries.

Usage:
    python tools/dump_plans_r16.py <sf_dir> <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt per query.  Run once at the
pre-round-15 commit (suffix "before") and once at HEAD (suffix
"after"); the streaming near-dup queries execute a micro-batch replay
rather than returning one lazy DataFrame, so they are skipped here and
documented via their batch-oracle siblings instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from form700_etl_spark.registry import all_queries
    from form700_etl_spark.session import get_spark

    spark = get_spark("plan-dump-r16")
    queries = all_queries()
    for name in names:
        df = queries[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
