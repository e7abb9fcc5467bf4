"""AQE skew-join evidence: Spark's runtime skew handling actually
fires under this repo's session configuration.

The manual remedies (operators/skew.py salting, the fuzzy join's
hot-block guard, MAX_SHINGLE_DF) handle skew the optimizer cannot see
— inside aggregations and candidate generation.  For plain joins the
design stance is "let AQE split the hot partitions at runtime"; this
test proves that stance is real, not aspirational: a 95%-hot-key join
executes with ``SortMergeJoin(skew=true)`` in the FINAL adaptive plan
and still returns exactly the correct result.

Note the probe inspects the plan of the collected DataFrame itself —
``df.count()`` or a write wraps the frame in a different query
execution whose adaptive decisions are invisible from ``df``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    # production defaults would need GBs to trip; tighten thresholds so
    # the 200k-row fixture-scale join exhibits the same runtime decision
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "16",
}


def test_aqe_splits_hot_key_join(spark):
    conf = spark.conf
    old = {k: conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            conf.set(k, v)
        left = spark.range(0, 200_000, 1, 16).select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.rpad(F.col("id").cast("string"), 64, "x").alias("pad"),
        )
        right = spark.range(0, 1000, 1, 16).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    finally:
        for k, v in old.items():
            conf.set(k, v) if v is not None else conf.unset(k)
    # every left row has exactly one right match
    assert len(rows) == 200_000
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, "AQE did not split the skewed partition"
