"""Scale-pattern queries: skew-safe salted plans and the as-of
operator, each oracle-checked against its direct (unsalted / SQL-ASOF)
equivalent — proving the optimized plan computes the SAME relation.
Plus collection-function and filtered-aggregate surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.money import cents, cents_sql
from ..io import table
from ..registry import register


@register(
    "salted_aggregate_equivalence",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(MIN({cents_sql('l_extendedprice')}) AS BIGINT) / 100.0 AS min_price,
           CAST(MAX({cents_sql('l_extendedprice')}) AS BIGINT) / 100.0 AS max_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    tags=("scale", "agg", "skew"),
    doc=(
        "Two-phase salted aggregation over the skewed low-cardinality "
        "(returnflag, linestatus) keys — 16-way salt spreads each hot key "
        "across reducers; the oracle is the plain GROUP BY (exact equality "
        "of the decomposed plan)."
    ),
)
def salted_aggregate_equivalence(spark, sf_dir):
    from ..operators.skew import salted_aggregate

    l = table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        l,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "n": (F.lit(1), "count"),
            "sum_qty": (F.col("l_quantity").cast("long"), "sum"),
            "min_price_c": (cents("l_extendedprice"), "min"),
            "max_price_c": (cents("l_extendedprice"), "max"),
        },
        n_salts=16,
        salt_source="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        "sum_qty",
        (F.col("min_price_c") / F.lit(100.0)).alias("min_price"),
        (F.col("max_price_c") / F.lit(100.0)).alias("max_price"),
    )


@register(
    "salted_join_equivalence",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("scale", "join", "skew"),
    doc=(
        "Salted left join (fact salted 8 ways, dim replicated per salt) — "
        "the skew-safe shuffle-join plan; oracle is the plain left join."
    ),
)
def salted_join_equivalence(spark, sf_dir):
    from ..operators.skew import salted_broadcast_left_join

    l = table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    joined = salted_broadcast_left_join(l, o, key="k", n_salts=8, salt_source="l_linenumber")
    return joined.select(
        F.col("k").alias("l_orderkey"), "l_linenumber", "o_orderpriority"
    )


@register(
    "asof_operator_signup_value",
    oracle="""
    WITH signups AS (
        SELECT user_id, ts,
               MAX(event_id) AS signup_id,
               arg_max(value, event_id) AS signup_value
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           CAST(s.signup_id AS BIGINT) AS asof_signup_id,
           s.signup_value AS asof_signup_value
    FROM events e ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND s.ts <= e.ts
    """,
    tags=("scale", "asof"),
    doc=(
        "operators.asof.asof_join_via_window (union + ordered window, no "
        "join) checked against DuckDB's NATIVE ASOF JOIN — same relation."
    ),
)
def asof_operator_signup_value(spark, sf_dir):
    from ..operators.asof import asof_join_via_window

    e = table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_id"),
        F.col("value").alias("signup_value"),
    )
    out = asof_join_via_window(
        e.select("event_id", "user_id", "ts"),
        signups,
        key="user_id",
        ts="ts",
        value_cols=["signup_id", "signup_value"],
        right_id="signup_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_signup_id").cast("long").alias("asof_signup_id"),
        F.col("asof_signup_value").alias("asof_signup_value"),
    )


@register(
    "scalar_collection_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           list_contains(string_split(p_name, ' '), 'spring') AS has_spring,
           array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '+') AS sorted_words,
           array_to_string(string_split(p_name, ' ')[1:2], '-') AS first_two,
           string_split(p_name, ' ')[1] AS head_word,
           array_to_string(list_reverse_sort(string_split(p_name, ' ')), ',') AS rev_sorted
    FROM part
    """,
    tags=("scalar", "collection"),
    doc="Array-function surface: size/contains/sort/distinct/slice/index/reverse-sort.",
)
def scalar_collection_funcs(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("int").alias("n_words"),
        F.array_contains(words, "spring").alias("has_spring"),
        F.array_join(F.sort_array(F.array_distinct(words)), "+").alias("sorted_words"),
        F.array_join(F.slice(words, 1, 2), "-").alias("first_two"),
        words.getItem(0).alias("head_word"),
        F.array_join(F.sort_array(words, asc=False), ",").alias("rev_sorted"),
    )


@register(
    "agg_bool_and_filtered",
    oracle=f"""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'P') AS any_pending,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(COALESCE(SUM({cents_sql('o_totalprice')}) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) / 100.0
             AS finished_total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
    doc="bool_and/bool_or and FILTER-clause (conditional) aggregates.",
)
def agg_bool_and_filtered(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.count_if(fin).alias("n_finished"),
        (
            F.coalesce(F.sum(F.when(fin, cents("o_totalprice"))), F.lit(0)) / F.lit(100.0)
        ).alias("finished_total"),
    )
