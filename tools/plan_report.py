#!/usr/bin/env python
"""Physical-plan report for the headline queries -> PLANS.md.

`.explain("formatted")` evidence, one section per query: the exact
artifact to check that filters reach the parquet scan (PushedFilters),
projection is pruned (ReadSchema), dimension joins broadcast, and the
Python boundary appears only where a query is deliberately
Arrow-batched.  The same properties are CI-enforced generically in
tests/test_plans.py; this report exists so a reviewer can read the
actual plans without running anything.

Usage:
    python tools/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Representative slice of the headline set: one per plan family.
REPORT_QUERIES = [
    ("q1_pricing_summary", "scan-side filter + exact-cents hash agg"),
    ("q3_top_unshipped_orders", "selective scans, broadcast dim, TakeOrdered"),
    ("flagship_mktsegment_revenue", "3-table join with size-aware broadcast hints"),
    ("window_top3_customers_per_nation", "rank window, single exchange per key"),
    ("dedup_minhash_lsh", "one-pass MinHash signatures + banded LSH candidates"),
    ("dedup_simhash_hamming", "16-bit-band blocking, first-match filter (no DISTINCT)"),
    ("dedup_ngram_coverage", "shingle-keyed df agg + re-join, linear (no pair join)"),
    ("text_langid_trained_vote", "model-table train/apply joins, integer-exact"),
    ("ann_cosine_topk_matmul", "deliberate Arrow boundary: BLAS block top-k"),
    ("asof_last_purchase_per_event", "as-of without a join: union + ordered window"),
    ("bloom_join_building_orders", "runtime bloom semi-join pruning before the fact exchange"),
    ("sql_lateral_topk_customers", "decorrelated lateral -> ranked window join"),
    ("text_bm25_topk", "term-filtered tf agg, broadcast df + corpus-stats tables"),
    ("skew_key_profile", "key-column-only scan, top-20 via one window over the key agg"),
    ("sketch_kmv_distinct", "engine-reproducible KMV sketch: distinct-hash window + rollup"),
    ("dedup_prefix_filter_join", "rarity-ordered prefix candidates; complete at J>=0.5, no hot-shingle pairs"),
    # fifth/sixth-wave representatives
    ("timeseries_ewma", "16 lag columns share ONE user-keyed window/exchange"),
    ("graph_triangle_count", "degree-ordered orientation; adjacency-intersect closing (no wedge rows)"),
    ("text_winnowing_shared_pairs", "one bigint window-min selection; checkpointed fingerprint reuse"),
    ("sample_dsir_importance", "256-bucket broadcast histograms; TakeOrdered top-100"),
    ("text_repeated_substring_spans", "gram groupBy with partial counts; island window"),
    ("dedup_semantic_clusters", "bucketed cosine pairs -> connected components -> canonical"),
    ("events_rfm_segments", "broadcast percentile thresholds; scan-side quintile scoring"),
    # seventh/eighth-wave representatives
    ("feature_target_encode_smoothed", "checkpointed category partials; broadcast 1-row prior"),
    ("embedding_pca_covariance", "one scan -> 44-way explode -> checkpointed moments; broadcast dims"),
    ("stats_ks_two_sample", "value-grain ECDF window; integer sup-distance"),
    ("graph_adamic_adar_links", "degree-capped wedge hash join; anti join; TakeOrdered"),
    ("text_rake_keywords", "phrase-grain re-aggregation; broadcast word scores; TakeOrdered"),
    ("linkage_fs_scores", "fuzzy-join candidates + broadcast u-table; e6 integer score sums"),
    # eleventh/twelfth-wave representatives
    ("stats_spearman_rank_corr", "one fact scan -> checkpointed pair grain; two value-grain rank windows"),
    ("geo_knn_grid_join", "adaptive two-phase grid: fine-cell hash join, sparse-residue escalation"),
    ("events_ushape_attribution", "three user-partitioned windows off one events scan"),
    ("stats_bootstrap_ci_poisson", "32-replicate explode; point estimate re-aggregates replicate partials"),
    ("skyline_pareto_frontier", "dominance as one running-min window over the size grain"),
    ("text_pmi_cooccurrence", "windowed pair generation off the checkpointed token arrays"),
    # round-6 families: scan-side k-means assignment, iterative peel,
    # value-grain rank tests, bucket-blocked interval join, fusion.
    ("embedding_kmeans_lloyd", "broadcast-centers assignment: no join, no window, one hash agg"),
    ("graph_kcore_peel_profile", "per-round semi-joins + degree agg over the checkpointed survivor set"),
    ("graph_personalized_pagerank", "sparse random-walk-with-restart: one lazy lineage, 1-row restart union per round"),
    ("temporal_scd2_asof_join", "SCD2 as-of fact join: equi join on the key, validity window as residual predicate"),
    ("stats_kruskal_wallis", "one value-grain rank window, micro-quantized k-term combine"),
    ("intervals_overlap_join", "week-bucket equi join + distinct + exact overlap verify"),
    ("ann_hybrid_rrf_fusion", "two streamed WindowGroupLimit rankings (hoisted norms) + exact RRF combine"),
    ("clean_quantile_normalize_groups", "sorted-union forward as-of window at value grain"),
    # round-13 additions
    ("contamination_longest_match", "seed-gram join (benchmark side broadcast); diagonal island window"),
    ("text_impact_sparse_retrieval", "pruned postings window; broadcast query vectors; exact bigint scores"),
    # round-14 additions: the partitioned prefix-sum shape (range
    # partition -> pid-grain offsets -> per-pid windows) and the
    # explicit TakeOrdered-then-rank top-k
    ("sample_epoch_shuffle_shards", "global shuffle rank via two-pass partitioned prefix; per-pid windows only"),
    ("abc_pareto_parts_classification", "part-grain revenue cumsum via partitioned prefix; broadcast 1-row total"),
    ("sample_weighted_topk_aes", "scan -> explicit TakeOrdered(50) -> rank survivors"),
    # round-15 additions: the two allowlist closures (value-domain
    # grains moved onto the partitioned prefix sum) and the new mixers
    ("mlprep_conformal_intervals", "checkpointed model+residual split; calib quantile via partitioned prefix"),
    ("stats_roc_auc", "doubled-midrank cumulative via partitioned prefix over the score grain"),
    ("sample_epoch_repetition_mix", "scan-side fractional-epoch explode; no shuffle"),
]


def main() -> None:
    from form700_etl_spark.registry import all_queries
    from form700_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-report")
    queries = all_queries()

    print("# PLANS — formatted physical plans of representative headline queries")
    print()
    print(f"Generated by `python tools/plan_report.py {sf_dir}`; regenerate after")
    print("any plan-affecting change.  What to look for in each section:")
    print("`PushedFilters` non-empty on filtered scans, `ReadSchema` holding only")
    print("projected columns, `BroadcastHashJoin` on dimension sides,")
    print("`WholeStageCodegen` spans over the JVM expression work, and Python")
    print("nodes (`MapInPandas`/`ArrowEvalPython`) ONLY in deliberately")
    print("Arrow-batched operators.")
    print()
    for name, note in REPORT_QUERIES:
        df = queries[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        print(f"## {name}")
        print()
        print(f"_{note}_")
        print()
        print("```")
        print(plan.rstrip())
        print("```")
        print()
    spark.stop()


if __name__ == "__main__":
    main()
