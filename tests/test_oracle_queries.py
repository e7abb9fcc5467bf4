"""Every registered query with an oracle must hash-match DuckDB — the
local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from form700_etl_spark.registry import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # rows-only check (non-SQL-expressible op): it must at least run
        assert df.count() >= 0
        return
    compare(df, oracle_con, q.oracle, name=name)
