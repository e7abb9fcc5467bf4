"""Bloom-filter semi-join laws (operators/bloom.py).

The operator's contract is one-sided: NEVER a false negative (every
true match survives the prune), false positives allowed and removed by
the exact join that follows.  Both halves are asserted, including under
a deliberately undersized bitmap where false positives are guaranteed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from form700_etl_spark.io import table
from form700_etl_spark.operators.bloom import bloom_build, bloom_semi_join


def _sides(spark, sf_dir):
    dim = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    fact = table(spark, sf_dir, "orders")
    return fact, dim


def test_no_false_negatives(spark, sf_dir):
    fact, dim = _sides(spark, sf_dir)
    pruned = bloom_semi_join(fact, "o_custkey", dim, "c_custkey")
    exact = fact.join(dim, fact.o_custkey == dim.c_custkey, "left_semi")
    # every exact match is in the pruned set
    missing = exact.join(pruned.select("o_orderkey"), "o_orderkey", "left_anti")
    assert missing.count() == 0


def test_prune_is_selective_at_default_size(spark, sf_dir):
    fact, dim = _sides(spark, sf_dir)
    pruned_n = bloom_semi_join(fact, "o_custkey", dim, "c_custkey").count()
    total_n = fact.count()
    exact_n = fact.join(dim, fact.o_custkey == dim.c_custkey, "left_semi").count()
    # strictly thinner than the input, and >= the exact match count
    assert exact_n <= pruned_n < total_n


def test_undersized_bitmap_still_superset_never_subset(spark, sf_dir):
    """m = 64 bits for hundreds of keys: the filter saturates and leaks
    false positives — but must still contain every true match."""
    fact, dim = _sides(spark, sf_dir)
    pruned = bloom_semi_join(fact, "o_custkey", dim, "c_custkey", m_bits=64, k=2)
    exact = fact.join(dim, fact.o_custkey == dim.c_custkey, "left_semi")
    assert exact.join(pruned.select("o_orderkey"), "o_orderkey", "left_anti").count() == 0
    assert pruned.count() >= exact.count()


def test_bitmap_is_bounded_sparse_map(spark, sf_dir):
    _, dim = _sides(spark, sf_dir)
    m_bits = 1 << 12
    row = bloom_build(dim, "c_custkey", m_bits=m_bits, k=4).collect()[0]
    bm = row[0]
    assert len(bm) <= m_bits // 64  # never denser than the full bitmap
    assert all(0 <= w < m_bits // 64 for w in bm.keys())
