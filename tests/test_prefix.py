"""Laws for operators/prefix.py — the two-pass partitioned prefix
sum/rank that replaces empty-partition-spec cumulative windows.

The contract: identical results to the single-partition window it
replaces, for any input partitioning and any operator partition count —
while the plan keeps row-grain data out of SinglePartition exchanges
(asserted registry-wide in test_plans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from form700_etl_spark.operators.prefix import partitioned_prefix_sum


def _fixture(spark, n=1000, slices=7):
    # non-monotone values with ties; unique id as tie-break
    return spark.range(0, n, 1, slices).select(
        F.col("id"),
        ((F.col("id") * 37) % 11).alias("v"),
        ((F.col("id") * 13) % 5 + 1).alias("w"),
    )


def test_cumsum_and_rank_match_driver_reference(spark):
    df = _fixture(spark)
    out = partitioned_prefix_sum(
        df, [F.col("v").desc(), "id"], sum_cols=("w",), rank_col="rk"
    ).collect()
    rows = sorted(((-r.v, r.id, r.w) for r in out))
    running, expect = 0, {}
    for i, (nv, rid, w) in enumerate(rows, start=1):
        running += w
        expect[rid] = (i, running)
    assert len(out) == len(rows)
    for r in out:
        exp_rk, exp_cum = expect[r.id]
        assert (r.rk, r.cum_w) == (exp_rk, exp_cum), (r, exp_rk, exp_cum)


def test_rank_is_dense_permutation(spark):
    df = _fixture(spark, n=500, slices=3)
    ranks = [
        r.rk
        for r in partitioned_prefix_sum(df, ["id"], rank_col="rk").collect()
    ]
    assert sorted(ranks) == list(range(1, 501))


def test_invariant_to_input_partitioning_and_operator_partitions(spark):
    a = partitioned_prefix_sum(
        _fixture(spark, slices=2), ["v", "id"], sum_cols=("w",), rank_col="rk"
    )
    b = partitioned_prefix_sum(
        _fixture(spark, slices=13),
        ["v", "id"],
        sum_cols=("w",),
        rank_col="rk",
        num_partitions=5,
    )
    ka = {(r.id, r.rk, r.cum_w) for r in a.collect()}
    kb = {(r.id, r.rk, r.cum_w) for r in b.collect()}
    assert ka == kb


def test_fewer_rows_than_partitions(spark):
    df = spark.range(0, 3, 1, 2).select("id", F.lit(1).alias("w"))
    out = sorted(
        (r.id, r.rk, r.cum_w)
        for r in partitioned_prefix_sum(
            df, ["id"], sum_cols=("w",), rank_col="rk"
        ).collect()
    )
    assert out == [(0, 1, 1), (1, 2, 2), (2, 3, 3)]


def test_null_runs_match_global_window_semantics(spark):
    """ADVICE r14: an all-NULL range partition must not poison the
    offsets.  Global-window parity: cum_w at a row is the running sum
    of non-null w so far, and NULL only while NO non-null value has
    appeared yet in the global order.  w is NULL in two 10-row runs
    (ids 0-9 and 20-29); with 8 operator partitions over 40 rows, at
    least one partition falls entirely inside a NULL run, exercising
    the all-NULL-partition offset path."""
    df = spark.range(0, 40, 1, 3).select(
        "id",
        F.when((F.col("id") % 20) >= 10, F.col("id")).alias("w"),
    )
    out = {
        r.id: r.cum_w
        for r in partitioned_prefix_sum(
            df, ["id"], sum_cols=("w",), num_partitions=8
        ).collect()
    }
    running, expect = None, {}
    for i in range(40):
        if (i % 20) >= 10:
            running = (running or 0) + i
        expect[i] = running
    assert out == expect


def test_with_totals_matches_global_sum_semantics(spark):
    """tot_<c> must equal SUM(c) OVER () — the grand total over ALL rows
    (NULLs ignored; NULL iff every value is NULL) — attached identically
    to every output row, for any operator partition count, including
    partitions that are entirely NULL (the ADVICE-r14 offset fixture)."""
    df = spark.range(0, 40, 1, 3).select(
        "id",
        F.when((F.col("id") % 20) >= 10, F.col("id")).alias("w"),
    )
    out = partitioned_prefix_sum(
        df, ["id"], sum_cols=("w",), num_partitions=8, with_totals=True
    ).collect()
    expected_tot = sum(i for i in range(40) if (i % 20) >= 10)
    assert len(out) == 40
    assert {r.tot_w for r in out} == {expected_tot}
    # all-NULL input: tot must be NULL, matching SUM(w) OVER ()
    nul = spark.range(0, 7, 1, 2).select(
        "id", F.lit(None).cast("long").alias("w")
    )
    out2 = partitioned_prefix_sum(
        nul, ["id"], sum_cols=("w",), num_partitions=3, with_totals=True
    ).collect()
    assert len(out2) == 7 and {r.tot_w for r in out2} == {None}
    # default stays off: no tot_* column in the classic shape
    assert "tot_w" not in partitioned_prefix_sum(
        df, ["id"], sum_cols=("w",)
    ).columns


def test_prefix_sum_property_matches_reference(spark):
    """Hypothesis: arbitrary (value, weight-with-NULLs) corpora, random
    input slicing and operator partition counts — cum/rank must match
    the exact Python reference under the total order (v, id), including
    NULL-iff-no-prior-non-null semantics.  One Spark job per example
    (small max_examples; the per-example frames are tiny)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(-5, 5),
                st.one_of(st.none(), st.integers(-1000, 1000)),
            ),
            min_size=1,
            max_size=120,
        ),
        st.integers(1, 9),
        st.integers(1, 6),
    )
    def run(rows, n_parts, slices):
        df = spark.createDataFrame(
            [(i, v, w) for i, (v, w) in enumerate(rows)],
            "id long, v long, w long",
        ).repartition(slices)
        out = {
            r.id: (r.rk, r.cum_w)
            for r in partitioned_prefix_sum(
                df,
                ["v", "id"],
                sum_cols=("w",),
                rank_col="rk",
                num_partitions=n_parts,
            ).collect()
        }
        ordered = sorted(enumerate(rows), key=lambda t: (t[1][0], t[0]))
        running = None
        for rk, (rid, (v, w)) in enumerate(ordered, start=1):
            if w is not None:
                running = (running or 0) + w
            assert out[rid] == (rk, running), (rid, out[rid], (rk, running))

    run()
