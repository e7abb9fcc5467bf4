"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in :mod:`form700_etl_spark` — this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the engine package lives next to this file; make the import robust to
# whatever cwd the harness driver uses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from form700_etl_spark.io import SMOKE_SF_DIR
from form700_etl_spark.registry import oracle_sqls, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from form700_etl_spark.queries.relational import flagship_mktsegment_revenue

    return flagship_mktsegment_revenue(spark, SMOKE_SF_DIR)


def _never_driver_sampled_first(names) -> list[str]:
    """Order query names so those NEVER sampled by a prior driver
    correctness round come first.

    The registry (355 queries as of round 10) outgrew the driver's
    per-round sample (50), so rotation by registration order left a pool
    of queries that only the local full-sweep harness has ever checked.
    Reading the committed CORRECTNESS_r*.json files makes the ordering
    self-rotating: each round's sample drains the never-sampled pool.

    Within the never-sampled pool, names listed in QUEUE_r09.txt (the
    pool as it stood at the end of round 9) keep their priority; queries
    registered later queue BEHIND them, so new work never displaces the
    long-waiting remnants from a round's 50-query sample.
    """
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(f) as fh:
                seen |= set(json.load(fh))
        except Exception:  # noqa: BLE001 — artifact files are advisory
            continue
    try:
        with open(os.path.join(here, "QUEUE_r09.txt")) as fh:
            r09_pool = {n.strip() for n in fh if n.strip()}
    except OSError:
        r09_pool = set(names)  # no manifest -> original behavior
    never = [n for n in names if n not in seen]
    return (
        [n for n in never if n in r09_pool]
        + [n for n in never if n not in r09_pool]
        + [n for n in names if n in seen]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = spark_queries()
    return {n: qs[n] for n in _never_driver_sampled_first(qs)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    os_ = oracle_sqls()
    return {n: os_[n] for n in _never_driver_sampled_first(os_)}
