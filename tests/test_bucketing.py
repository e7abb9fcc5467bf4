"""Bucketed-write co-located join: the shuffle-elimination pattern for
repeated joins on the same key (100 TB design — pre-shuffle once at
write time, join forever without exchanges)."""

from __future__ import annotations

from form700_etl_spark.io import table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # warehouse dir is a static conf set by the session factory
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketdemo.orders_b")
    )
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketdemo.lineitem_b")
    )
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderkey, COUNT(*) AS n
            FROM bucketdemo.orders_b o JOIN bucketdemo.lineitem_b l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed-bucketed equi-join on the bucket key: no shuffle before the join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        n_exchanges = plan.count("Exchange")
        # the only allowed exchange is for the final groupBy partial->merge;
        # with matching bucket counts the JOIN itself must not shuffle.
        assert n_exchanges == 0, f"expected bucket join without exchanges, got {n_exchanges}:\n{plan[:3000]}"
        # correctness: same counts as the plain join
        expected = (
            o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").count().count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.orders_b")
        spark.sql("DROP DATABASE IF EXISTS bucketdemo")
