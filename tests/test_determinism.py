"""Partitioning-independence law: a registered query's RESULT must not
depend on the shuffle partition count.

This is the repo's "determinism under parallelism" design rule made
executable: every window orders on a unique tie-break, every top-k
ranks on rounded keys + id, every sample/split keys off md5 — so
rerunning the same query with a very different shuffle layout (3 vs
the default 32 partitions) must produce the identical row multiset.
A query that failed this would also be nondeterministic under task
retries and speculative execution at cluster scale — the failure mode
this test exists to catch.

The sample below spans the plan families where partitioning bugs hide:
windows/top-k (order ties), aggregation (float summation order is
avoided by exact-cents math), LSH/banding (candidate generation),
iterative algorithms, and Arrow-batched ANN (partial top-k merges).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from form700_etl_spark.registry import all_queries

SAMPLE = [
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "window_top3_customers_per_nation",
    "window_rolling_median_value",
    "sort_top25_orders",
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "dedup_clusters_connected",
    "dedup_cross_split_leakage",
    "text_langid_trained_vote",
    "text_bpe_train_merges",
    "graph_pagerank_bipartite",
    "sample_stratified_per_lang",
    "pack_sequences_budget",
    "ann_cosine_topk_matmul",
    "asof_last_purchase_per_event",
    # round-5 third/fourth wave reps: prefix-filtered similarity join
    # (candidate generation + verify), BM25 (scored top-k), weighted
    # exact-k sampling (float-key global rank), attribution walk
    "dedup_prefix_filter_join",
    "text_bm25_topk",
    "sample_weighted_topk_aes",
    "events_last_touch_attribution",
    # fifth/sixth wave reps: lag-window EWMA (ordered ties), degree-
    # oriented triangle join, winnowing (window-min selection + pair
    # join), ExactSubstr islands, SemDeDup component labels, RFM
    # threshold scoring
    "timeseries_ewma",
    "graph_triangle_count",
    "text_winnowing_shared_pairs",
    "text_repeated_substring_spans",
    "dedup_semantic_clusters",
    "events_rfm_segments",
    # seventh/eighth wave reps: checkpointed-partial target encoding,
    # value-grain cumulative bins, 128-bit covariance moments, integer
    # ECDF sup-distance, degree-capped wedge scores (e9-quantized sums),
    # phrase-grain RAKE top-k
    "feature_target_encode_smoothed",
    "clean_quantile_bins",
    "embedding_pca_covariance",
    "stats_ks_two_sample",
    "graph_adamic_adar_links",
    "text_rake_keywords",
    # ninth wave reps: BFS frontier levels, F-S top-50 (score ties
    # broken on ids), config-compiled pipeline
    "graph_bfs_hops",
    "linkage_fs_scores",
    "training_pipeline_from_config",
    # tenth wave reps: hash-ring negative lookup (bucketed window),
    # variant-assigned conversion counts
    "sample_negative_pairs",
    "stats_proportion_ztest",
]


def _result_fingerprint(df):
    """Order-insensitive multiset fingerprint of a result, built on the
    repo's single canonical row-hash definition (sinks.shards)."""
    from form700_etl_spark.sinks.shards import content_hash_col

    agg = df.select(content_hash_col(df).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("h").alias("s")
    ).collect()[0]
    return (agg.n, agg.s)


@pytest.mark.parametrize("name", SAMPLE)
def test_result_independent_of_shuffle_partitions(name, spark, sf_dir):
    fn = all_queries()[name].fn
    conf = spark.conf
    default = conf.get("spark.sql.shuffle.partitions")
    baseline = _result_fingerprint(fn(spark, sf_dir))
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        skewed = _result_fingerprint(fn(spark, sf_dir))
    finally:
        conf.set("spark.sql.shuffle.partitions", default)
    assert skewed == baseline
