"""Spark-SQL-API queries (build plan M3): the same engine surface
driven through ``spark.sql`` over registered temp views — Catalyst
produces identical plans for DataFrame and SQL forms, and the judge's
surface includes the SQL front door.

Also home of the approximate operators (approx_count_distinct /
percentile_approx): their values are implementation-defined, so they
are registered WITHOUT an oracle (rows-only check) but each result
carries the exact value alongside for sanity bounds, covered by tests.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf type hints resolve via module globals
from pyspark.sql import functions as F

from ..functions.money import cents_sql
from ..io import register_views, table
from ..registry import register


@register(
    "sql_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
    """,
    tags=("agg", "sql"),
    doc="Explicit GROUPING SETS through the SQL front door (distinct from rollup/cube).",
)
def sql_grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n,
               -- NB: '100.0' in Spark SQL is a DECIMAL literal (unlike
               -- F.lit(100.0)); cast the sum to DOUBLE to keep the double
               -- output type the oracle expects
               CAST(SUM({cents_sql('o_totalprice')}) AS DOUBLE) / CAST(100 AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        """
    )


@register(
    "sql_exists_in_subqueries",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                  AND l.l_quantity >= 49)
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
    """,
    tags=("join", "subquery", "sql"),
    doc="Correlated EXISTS + uncorrelated IN subqueries (Catalyst decorrelates to semi joins).",
)
def sql_exists_in_subqueries(spark, sf_dir):
    register_views(spark, sf_dir, ("supplier", "lineitem", "nation"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                      AND l.l_quantity >= 49)
          AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        """
    )


@register(
    "sql_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "subquery", "sql"),
    doc="TPC-H Q4-style: EXISTS against the fact table, grouped priority counts.",
)
def sql_q4_priority_check(spark, sf_dir):
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "sql_scalar_subquery",
    oracle=f"""
    SELECT n_name,
           CAST((SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS BIGINT)
             AS n_customers,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS total_orders
    FROM nation n
    """,
    tags=("subquery", "sql"),
    doc="Correlated + uncorrelated scalar subqueries in the projection.",
)
def sql_scalar_subquery(spark, sf_dir):
    register_views(spark, sf_dir, ("nation", "customer", "orders"))
    return spark.sql(
        """
        SELECT n_name,
               (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey)
                 AS n_customers,
               (SELECT COUNT(*) FROM orders) AS total_orders
        FROM nation n
        """
    )


@register(
    "pandas_udf_scalar_normalize",
    oracle="""
    SELECT c_custkey,
           replace(lower(trim(c_name)), 'customer#', 'cust-') AS normalized,
           CAST(length(replace(lower(trim(c_name)), 'customer#', 'cust-')) AS INT) AS n_len
    FROM customer
    """,
    tags=("udf", "scalar"),
    doc=(
        "Scalar pandas_udf (Arrow-vectorized Python) doing deterministic "
        "string normalization — the §2.8 UDF surface; oracle recomputes in SQL."
    ),
)
def pandas_udf_scalar_normalize(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace("customer#", "cust-", regex=False)

    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        normalize("c_name").alias("normalized"),
        F.length(normalize("c_name")).cast("int").alias("n_len"),
    )


@register(
    "approx_distinct_and_quantiles",
    oracle=None,  # approximate values are implementation-defined: rows-only
    tags=("agg", "approx"),
    doc=(
        "approx_count_distinct (HLL++) and percentile_approx alongside their "
        "exact counterparts; bounds asserted in tests, no cross-engine oracle."
    ),
)
def approx_distinct_and_quantiles(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.percentile_approx("o_totalprice", 0.5).alias("approx_median_price"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_median_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "sketch_hll_rollup",
    oracle=None,
    tags=("approx", "sketch", "scale"),
    doc=(
        "Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg): "
        "distinct users sketched per (event_type, day) shard, then rolled "
        "up to per-type estimates by UNIONING the stored sketches — the "
        "second pass never touches raw data.  Rows-only check here; the "
        "mergeability law estimate(union(partials)) == estimate(whole) is "
        "asserted exactly in tests/test_functions.py."
    ),
)
def sketch_hll_rollup(spark, sf_dir):
    from ..operators.sketches import distinct_sketches, rollup_sketches

    e = table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    daily = distinct_sketches(e, ["event_type", "day"], "user_id")
    return rollup_sketches(daily, ["event_type"]).orderBy("event_type")
