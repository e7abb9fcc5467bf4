#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  The LAST
stdout line is ONE COMPACT JSON line (~300 bytes): {"metric": ...,
"value": N, "unit": "sec", "value_r4_query_set": N, "sf": ...} — the
full per-query map lives in BENCH_DETAIL.json and on an earlier
stdout line, so the driver's tail capture always parses the final line
(round 5's single giant line overflowed it).  The round-comparable
24-query r4 subtotal is measured in its own fresh JVM subprocess
(`bench.py --subset r4`) so single-JVM suite pressure can't inflate it.

Timing method: each query runs twice and the BEST time is reported —
steady-state throughput, with first-touch JVM codegen / parquet-footer
costs amortized, which is what matters at 100 TB where every plan runs
hot.  Materialization is .count() on the result.
"""

from __future__ import annotations

import json
import os
import re
import time

from form700_etl_spark.registry import all_queries
from form700_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_region_nation_revenue",
    "q6_forecast_revenue",
    "q13_customer_order_distribution",
    "flagship_mktsegment_revenue",
    "join_left_customer_orders",
    "window_top3_customers_per_nation",
    "sessionize_user_events",
    "events_tumbling_hourly",
    "dedup_minhash_lsh",
    "dedup_exact",
    "text_quality_score",
    "text_tfidf_top_terms",
    "ann_cosine_topk_bruteforce",
    "ann_cosine_topk_matmul",
    "asof_last_purchase_per_event",
    "pack_sequences_budget",
    "quality_filter_pipeline",
    # r4 flagged contamination_ngram_overlap 1.106->1.338s; r5 profiling
    # (best-of-3, quiet machine, checkpoint vs filter-first variants both
    # 0.83-0.97s) shows the delta was machine-load variance, not plan drift.
    "contamination_ngram_overlap",
    "sketch_hll_rollup",
    "dedup_clusters_connected",
    "ann_ivf_topk",
    # single-dataset end-to-end ETL (synthesize -> explode -> broadcast
    # join -> registry routing -> clean): the engine-work slice of the
    # pipeline.  The 16-dataset dual audit stays a CORRECTNESS query —
    # at bench SF its time is dominated by synthetic-source generation,
    # which would measure the fixture, not the engine.
    "ref_pipeline_scheduleA2",
    # round-4 operators (bench blind spot closed in round 5): the
    # heaviest dedup variant, the fuzzy join, both new text-dedup
    # passes, the interpolation window, and the PQ ANN path.
    "dedup_simhash_hamming",
    "fuzzy_join_part_names",
    "timeseries_linear_interpolate",
    "text_intra_doc_dedup",
    "text_boilerplate_line_removal",
    "ann_pq_topk",
    # round-5 operators: runtime join filter, layout key, corpus-wide
    # paragraph dedup, cluster canonicalization, iterative PageRank and
    # BPE training, exact rolling median, cohort/funnel analytics,
    # inverted index, JL projection.
    "bloom_join_building_orders",
    "zorder_key_events",
    "text_global_segment_dedup",
    "dedup_canonical_per_cluster",
    "graph_pagerank_bipartite",
    "text_bpe_train_merges",
    "window_rolling_median_value",
    "events_retention_cohorts",
    "text_inverted_index_top_terms",
    "embedding_random_projection",
    # round-5 second wave: cross-split decontamination (minhash-shaped),
    # duplicate-n-gram coverage (linear, two shingle-keyed shuffles),
    # trained token-vote classifier (train/apply join), quality-weighted
    # sampling (scan-side filter).
    "dedup_cross_split_leakage",
    "dedup_ngram_coverage",
    "text_langid_trained_vote",
    "sample_quality_weighted",
    # round-5 third wave: BM25 relevance, token entropy, containment
    # near-dup (shares the jaccard candidate structure), filtered ANN,
    # skew diagnostics, PSI drift screen, incremental agg maintenance,
    # exact-k weighted sampling.
    "text_bm25_topk",
    "text_token_entropy",
    "dedup_containment_pairs",
    "ann_filtered_topk",
    "skew_key_profile",
    "drift_psi_event_values",
    "incremental_agg_merge",
    "sample_weighted_topk_aes",
    # round-5 fourth wave: KMV sketch, exact prefix-filtered similarity
    # join (its sf0.1 cost is the 31-word fixture-vocab artifact — flat
    # 1.1x across the 10x Heaps-scaled probe corpus, see SCALE.md),
    # exact-moment statistics.
    "sketch_kmv_distinct",
    "dedup_prefix_filter_join",
    "stats_exact_correlation",
    "stats_mutual_information",
    "stats_gini_concentration",
    "stats_ols_price_on_quantity",
    "events_last_touch_attribution",
    # round-5 fifth wave: exact 16-lag EWMA (one keyed window), chi-square
    # independence, degree-oriented triangle count (three graph-keyed hash
    # joins), bigram-LM NLL scoring (train/apply joins), DSIR importance
    # selection (256-bucket broadcast histograms), winnowing fingerprints
    # (per-doc window min + df-capped pair join).
    "timeseries_ewma",
    "stats_chi_square_independence",
    "graph_triangle_count",
    "text_bigram_lm_nll",
    "sample_dsir_importance",
    "text_winnowing_shared_pairs",
    # round-5 sixth wave: ExactSubstr spans (gram groupBy + island
    # window; its sf0.1 cost is the 31-word-vocab artifact — every gram
    # repeats, so nearly all positions survive the df>=2 filter; see
    # SCALE.md), the bucketed kNN graph, and group-median imputation.
    "text_repeated_substring_spans",
    "ann_knn_graph_bucketed",
    "clean_impute_group_median",
    "dedup_semantic_clusters",
    "events_rfm_segments",
    "text_bpe_encode_heldout",
    # round-5 seventh wave (ML feature prep + time-series analytics):
    # target encoding (fact join + checkpointed partials), the hashing
    # trick (pure scan-side), equi-depth bins (value-grain window),
    # exact covariance moments (44-way explode, one scan), distributed
    # PCA (two mapInPandas passes), seasonal decomposition and lagged
    # cross-correlation (day-spine windows/self-joins).
    "feature_target_encode_smoothed",
    "feature_hash_trick",
    "clean_quantile_bins",
    "embedding_pca_covariance",
    "embedding_pca_project",
    "timeseries_seasonal_decompose",
    "timeseries_cross_correlation_lag",
    # round-5 eighth wave: distribution-shift statistics (KS / Welch),
    # Adamic-Adar link prediction (degree-capped wedge join), RAKE
    # keyword extraction (phrase-grain scoring).
    "stats_ks_two_sample",
    "stats_welch_ttest",
    "graph_adamic_adar_links",
    "text_rake_keywords",
    "events_top_trigram_paths",
    "stats_mann_whitney_u",
    "training_pipeline_from_config",
    "multimodal_audio_decode",
    "graph_bfs_hops",
    "dedup_lsh_scurve_report",
    "linkage_fs_scores",
    "multimodal_image_decode",
    "multimodal_video_frames_real",
    "dedup_lsh_recall_eval",
    # round-5 tenth wave: A/B z-test, funnel latency quantiles,
    # hash-ring contrastive negative mining.
    "stats_proportion_ztest",
    "events_time_to_convert_percentiles",
    "sample_negative_pairs",
    "timeseries_spike_detector",
    "sketch_histogram_quantiles",
    # round-5 eleventh wave: rank correlation + ANOVA (exact-moment
    # stats), CUSUM changepoint, Benford audit, position attribution,
    # and the grid-blocked spatial kNN (cell-key hash join).
    "stats_spearman_rank_corr",
    "stats_anova_oneway",
    "timeseries_cusum_changepoint",
    "audit_benford_first_digit",
    "events_ushape_attribution",
    "geo_knn_grid_join",
    # round-5 twelfth wave: robust slope (day-grain pair median),
    # distributed bootstrap, skyline window, Jaccard link scores,
    # PMI collocations.
    "timeseries_theil_sen_slope",
    "stats_bootstrap_ci_poisson",
    "skyline_pareto_frontier",
    "graph_jaccard_neighbors",
    "text_pmi_cooccurrence",
    # round-5 thirteenth wave: corpus-tail estimate (count-of-counts),
    # Zipf authenticity slope, Fano burstiness screen.
    "text_good_turing_mass",
    "stats_zipf_slope",
    "events_burstiness_fano",
    # round-6 fourteenth wave: iterative k-core peel and node-grain
    # clustering coefficient over the support-filtered co-purchase graph.
    "graph_kcore_peel_profile",
    "graph_local_clustering_coeff",
    # round-6 fifteenth wave: ACF diagnostic, k-group rank ANOVA,
    # interval-union coalescing.
    "timeseries_acf",
    "stats_kruskal_wallis",
    "intervals_merge_overlaps",
    # round-6 fifteenth wave flagship: broadcast-centers Lloyd k-means.
    "embedding_kmeans_lloyd",
    # round-6 sixteenth wave: nearest as-of, classifier agreement,
    # variance homogeneity, Markov steady state.
    "asof_nearest_purchase_per_event",
    "stats_cohens_kappa_langid",
    "stats_brown_forsythe",
    "events_markov_stationary",
    # round-6 seventeenth wave: survival analysis + retention streaks.
    "events_kaplan_meier_conversion",
    "events_longest_daily_streak",
    # round-6 eighteenth wave: Gram-free distributed power iteration
    # and Kneser-Ney continuation-smoothed LM scoring.
    "embedding_power_iteration_top_pc",
    "text_kneser_ney_nll",
    # round-6 nineteenth wave: sketch set algebra + blocked interval join.
    "sketch_kmv_set_ops",
    "intervals_overlap_join",
    # round-6 twentieth wave: LPA communities + perceptual image dedup.
    "graph_label_propagation",
    "multimodal_image_dhash_neardup",
    # round-6 twenty-first wave: streaming KMV, association rules,
    # observe-API audit.
    "stream_kmv_distinct",
    "basket_association_rules",
    "audit_observe_single_pass",
    "clean_quantile_normalize_groups",
    "stats_ks_exponential_interarrival",
    "ann_hybrid_rrf_fusion",
    "events_cohort_ltv_curve",
    # round-6 twenty-fifth wave: generative classifier + GLM training.
    "text_naive_bayes_langid",
    "mlprep_logistic_regression_gd",
    "stats_permutation_test_means",
    "stats_wilcoxon_signed_rank",
    "text_js_divergence_sources",
    "stats_benjamini_hochberg_fdr",
    "events_dau_wau_mau_stickiness",
    "abc_pareto_parts_classification",
    "intervals_concurrency_profile",
    "multimodal_audio_fp_neardup",
    "stats_cohens_d_effect_sizes",
    "text_heaps_vocab_growth",
    # round-6 final waves: the pair-join cosine dedup, grid-blocked
    # DBSCAN, iterative HITS, the conformal split pipeline, and the
    # bounded-spine Holt smoother
    "text_tfidf_cosine_pairs",
    "geo_dbscan_clusters",
    "graph_hits_hubs_authorities",
    "mlprep_conformal_intervals",
    "timeseries_holt_linear",
    "text_textrank_keywords",
    "mlprep_knn_classifier_eval",
    "embedding_matryoshka_recall",
    "dedup_cdc_chunks",
    "text_zlib_compression_quality",
    # round-6 twenty-sixth wave: errors-in-variables fit, O(n) jackknife,
    # MASE forecast backtest, item-item CF, sorted-neighborhood linkage,
    # Markov removal-effect attribution.
    "stats_deming_regression",
    "stats_jackknife_ratio_se",
    "timeseries_seasonal_naive_mase",
    "recsys_item_item_jaccard_topk",
    "linkage_sorted_neighborhood",
    "events_markov_removal_attribution",
    # round-12: personalized PageRank (sparse random-walk-with-restart,
    # single-lineage loop) and the SCD2 as-of fact join (equi join on
    # the key + validity residual).
    "graph_personalized_pagerank",
    "temporal_scd2_asof_join",
    "sketch_ams_f2_selfjoin",
    # round-13: sequence-level contamination (seed-gram diagonal runs —
    # the suffix-array check, Spark-native) and SPLADE-style
    # impact-pruned sparse retrieval (quantized impacts, top-P postings
    # per term, term-at-a-time scoring).
    "contamination_longest_match",
    "text_impact_sparse_retrieval",
    "sample_source_temperature_mix",
    "text_ngram_novelty_score",
    # round-14: deterministic epoch shuffle + striped shard assignment
    # (global position via the two-pass partitioned rank).  The other
    # r14 debut, stream_simhash_near_dup, stays OUT of the suite for
    # the same reason as the dual audit: its wall is dominated by the
    # micro-batch replay harness (temp-dir writes + 4 stream triggers),
    # which would measure the harness, not the operator; its engine
    # cost is covered by dedup_simhash_hamming (same verify plan) and
    # the streaming section measures throughput separately.  (r15: the
    # TTL-bounded sibling stream_simhash_near_dup_windowed stays out
    # for the identical reason.)
    "sample_epoch_shuffle_shards",
]


# The exact query set BENCH_r04 recorded (18.222 s): the only round-over-
# round-comparable subtotal, because the headline list keeps growing.
R4_SET = HEADLINE[:24]

# --- Machine-normalization canary (round-7, VERDICT r6 task 3) -------------
# Round 6's official r4-comparable number (49.0 s fresh-JVM vs the 18.2 s r4
# record) was adjudicated as HOST SPEED, not regression: byte-identical code
# measured 17.9 s on an idle host and 40-49 s on the r6 sandbox — a 2.7x
# spread across three machines that nothing in BENCH_r*.json could detect.
# The canary is a fixed pure-JVM Spark job timed FIRST (before any suite
# pressure): whole-stage-codegen sum over a 300M range, best-of-3.  It has
# no I/O, no Python row path, and no data dependence, so its time is a clean
# proxy for (JVM x CPU x load) speed of the host.  Every suite number is
# reported raw AND canary-normalized: normalized = raw * (CANARY_REF_S /
# canary_s).  CANARY_REF_S was calibrated on the round-7 host the same day
# its suite numbers were recorded, so r7-vs-future comparisons divide out
# the host; pre-r7 records carry no canary and remain host-ambiguous.
# Re-anchored round 10 (VERDICT r9 task 1a): 0.2436 is the canary reading
# COMMITTED in BENCH_r07 — the same process that recorded the 24.19 s r4
# number — so normalized values are now in r7-host units.  The old 0.55 was
# a same-day-but-different-process calibration that drifted ~2.3x from the
# committed r7 reading and made value_r4_normalized nonsense (r9 published
# 101.4 "seconds" for a 42.6 s raw run).
CANARY_REF_S = 0.2436  # BENCH_r07 committed canary reading (r7 host units)


def _stage_totals(spark) -> dict[str, float]:
    """Cumulative per-stage executor metrics from the AppStatusStore
    (works with spark.ui.enabled=false — the store backs the UI, not the
    other way round).  Differencing two snapshots around a query gives
    the query's shuffle-write / spill / scan volume — the fields VERDICT
    r9 task 1b asks for, so a volatile wall-clock self-adjudicates
    (spill pressure vs plan drift vs host noise)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    darr = sc._gateway.new_array(sc._gateway.jvm.double, 0)
    empty = sc._jvm.java.util.ArrayList()
    totals = {
        "shuffle_write_mb": 0.0,
        "shuffle_read_mb": 0.0,
        "mem_spill_mb": 0.0,
        "disk_spill_mb": 0.0,
        "input_mb": 0.0,
        "executor_run_s": 0.0,
        # run_s INCLUDES GC and interpretation; cpu_s is actual CPU.
        # run_s >> cpu_s -> GC / scheduling stalls; cpu_s itself high on
        # a small input -> code running interpreted (JIT queue/code cache).
        "executor_cpu_s": 0.0,
        "executor_gc_s": 0.0,
    }
    it = store.stageList(None, False, False, darr, empty).iterator()
    mb = 1024.0 * 1024.0
    while it.hasNext():
        s = it.next()
        totals["shuffle_write_mb"] += s.shuffleWriteBytes() / mb
        totals["shuffle_read_mb"] += s.shuffleReadBytes() / mb
        totals["mem_spill_mb"] += s.memoryBytesSpilled() / mb
        totals["disk_spill_mb"] += s.diskBytesSpilled() / mb
        totals["input_mb"] += s.inputBytes() / mb
        totals["executor_run_s"] += s.executorRunTime() / 1000.0
        totals["executor_cpu_s"] += s.executorCpuTime() / 1e9
        totals["executor_gc_s"] += s.jvmGcTime() / 1000.0
    return totals


def _canary(spark) -> float:
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        spark.range(300_000_000).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        best = min(best, time.perf_counter() - start)
    return round(best, 4)


# --- Self-qualifying bench (round-15, VERDICT r14 task 3) -------------------
# Round 14's artifact was taken at loadavg 6-15 and host_factor 2.337; seven
# consecutive suite rows (positions 16-23) regressed 3-6x on UNCHANGED code —
# one co-tenant contention window, not seven regressions (run1~=run2 inside
# the window, every row steady-normal on a quiet host).  Three defenses so
# the committed artifact is the quiet-host run:
#   (a) startup gate: wait (bounded) for 1-min loadavg to drop before any
#       measurement, and re-measure the canary until host_factor <= 1.5 or
#       attempts run out — both traces recorded in the artifact;
#   (b) mid-suite mini-canaries every _MID_CANARY_EVERY queries — a CPU
#       codegen probe AND an fsync disk probe: rows whose neighborhood
#       probe exceeded 2x the run's median (CPU) or 3x-median/0.15 s
#       (disk) are REQUEUED and re-timed after the sweep (min wins), and
#       every row still slower than _SLOW_TAIL_S gets one more run, so a
#       transient window can't poison the best-of (bursts shorter than
#       the probe interval were observed hitting single rows' both runs
#       with flat CPU probes — the disk probe + slow-tail pass close
#       that gap);
#   (c) r4 fresh-JVM spread: if rel_spread (ex-scheduleA2) > 0.35, run up to
#       _R4_EXTRA more passes and re-summarize over all survivors.
QUIET_GATE_LOAD1 = float(os.environ.get("SPARK_GRAFT_BENCH_GATE_LOAD", "6"))
QUIET_GATE_WAIT_S = int(os.environ.get("SPARK_GRAFT_BENCH_GATE_WAIT", "900"))
MAX_HOST_FACTOR = 1.5
_MID_CANARY_EVERY = 12
_SLOW_TAIL_S = 2.0
_SLOW_TAIL_MAX = 32
_R4_EXTRA = 2
_R4_TARGET_SPREAD = 0.35


def _await_quiet_host() -> dict:
    """Bounded wait for co-tenant load to drain BEFORE any measurement
    (sampled pre-Spark, so the reading is co-tenants, not us)."""
    samples = []
    waited = 0
    while True:
        la = _loadavg()
        samples.append({"waited_s": waited, "loadavg": la})
        if not la or la[0] <= QUIET_GATE_LOAD1 or waited >= QUIET_GATE_WAIT_S:
            break
        time.sleep(60)
        waited += 60
    return {
        "gate_load1": QUIET_GATE_LOAD1,
        "max_wait_s": QUIET_GATE_WAIT_S,
        "samples": samples,
        "passed": bool(
            samples and samples[-1]["loadavg"]
            and samples[-1]["loadavg"][0] <= QUIET_GATE_LOAD1
        ),
    }


def _qualified_canary(spark) -> tuple[float, dict]:
    """The normalization canary, re-measured (bounded) until it
    qualifies: a reading implying host_factor > MAX_HOST_FACTOR gets
    up to 3 more attempts a minute apart; the BEST reading wins (the
    canary measures the host's quiet capability, so min is the honest
    statistic).  The attempt trace ships in the artifact."""
    attempts = []
    best = _canary(spark)
    attempts.append({"canary_s": best, "loadavg": _loadavg()})
    tries = 0
    while best / CANARY_REF_S > MAX_HOST_FACTOR and tries < 3:
        time.sleep(60)
        c = _canary(spark)
        attempts.append({"canary_s": c, "loadavg": _loadavg()})
        best = min(best, c)
        tries += 1
    return best, {
        "attempts": attempts,
        "qualified": best / CANARY_REF_S <= MAX_HOST_FACTOR,
    }


def _mini_canary(spark) -> float:
    """Single-shot 100M-range codegen sum (~1/3 the canary's work, one
    run): cheap enough to interleave through the suite, sensitive
    enough to see a co-tenant window."""
    start = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id * 2 + 1) AS s").collect()
    return round(time.perf_counter() - start, 4)


def _fs_type(path: str) -> str:
    """Filesystem type of the mount holding ``path`` (longest-prefix
    match over /proc/mounts), or '' when unreadable."""
    best, fstype = "", ""
    try:
        real = os.path.realpath(path)
        with open("/proc/mounts") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    mnt = parts[1]
                    if real.startswith(mnt.rstrip("/") + "/") or real == mnt:
                        if len(mnt) > len(best):
                            best, fstype = mnt, parts[2]
    except OSError:
        pass
    return fstype


def _io_probe_dir(spark) -> str:
    """Directory for the disk probe: the same filesystem the bench's
    own I/O hits (ADVICE r15).  $TMPDIR/tempfile.gettempdir() can be a
    tmpfs on some hosts, where an fsync probe never touches disk and
    the contention defense is blind — so prefer spark.local.dir (where
    shuffle files land), then the JVM's java.io.tmpdir, then this
    repo's directory, skipping RAM-backed filesystems when a
    disk-backed candidate exists."""
    import tempfile

    candidates = []
    try:
        candidates.append(spark.conf.get("spark.local.dir"))
    except Exception:
        pass
    try:
        candidates.append(
            spark.sparkContext._jvm.System.getProperty("java.io.tmpdir")
        )
    except Exception:
        pass
    candidates.append(os.path.dirname(os.path.abspath(__file__)))
    candidates.append(tempfile.gettempdir())
    usable = [c for c in candidates if c and os.path.isdir(c)]
    for c in usable:
        if _fs_type(c) not in ("tmpfs", "ramfs"):
            return c
    return usable[0] if usable else tempfile.gettempdir()


def _io_mini_canary(mb: int = 4, probe_dir: str | None = None) -> float:
    """Write-mb+fsync disk probe, paired with every CPU mini-canary.

    The round-15 closing sessions caught the CPU probe's blind spot: a
    co-tenant I/O workload inflated individual suite rows 2-4x while
    the in-JVM codegen probe (and so the requeue defense) stayed flat
    (n_requeued=0 on a run whose own rows were visibly hit).  An fsync
    round-trip senses disk contention directly.  Calibration on this
    host: ~0.019-0.026 s quiet, <=0.071 s right after the bench's own
    shuffle-heavy actions — so the flag threshold (3x median AND an
    absolute 0.15 s floor, see _run_suite) cannot be tripped by the
    bench itself, only by a genuinely contending co-tenant.

    ``probe_dir`` pins the probe file to the filesystem the bench
    actually uses (see _io_probe_dir); default stays $TMPDIR for
    standalone callers."""
    import tempfile

    buf = b"\x5a" * (1024 * 1024)
    start = time.perf_counter()
    fd, path = tempfile.mkstemp(prefix="bench_io_probe_", dir=probe_dir)
    try:
        for _ in range(mb):
            os.write(fd, buf)
        os.fsync(fd)
    finally:
        os.close(fd)
        os.unlink(path)
    return round(time.perf_counter() - start, 4)


def _loadavg() -> list[float]:
    """1/5/15-min load at measurement time — round 14 observed the
    canary itself swinging 0.22-0.49 s between processes minutes apart
    on this shared host; recording co-tenant load with every canary
    makes 'host was busy' adjudicable from the artifact instead of
    inferred."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


# Per-query override of the best-of-2 rule.  ref_pipeline_scheduleA2's
# generated projection (~300-field nested tree -> 40-column clean/cast)
# is so large that HotSpot takes several EXECUTIONS to finish compiling
# it: tools/profile_scheduleA2.py measured the same memoized plan at
# 1.9-6.8 s wall / 11-126 executor-s across consecutive runs, CPU-bound
# (cpu_s ~= run_s), zero spill, shuffle flat at 16.1 MB — i.e. the
# spread is interpreted-vs-JITted code, not the engine.  r12's 12.0 s /
# 303 executor-s row was exactly such an interpreted pair.  Best-of-4
# gives the JIT enough executions to reach steady state (the 100 TB
# operating point, where every plan runs hot for hours); the full
# decomposition lives in BENCH_DETAIL["scheduleA2_decomposition"].
#
# linkage_fs_scores (r12: 2.39 -> 5.88 s, VERDICT task 6) is the same
# JIT story at smaller amplitude: fresh-session profile at sf0.1 reads
# 12.85 / 3.44 / 3.27 / 3.16 / 2.62 s wall (78 -> 40 executor-s,
# CPU-bound, shuffle flat at 0.6 MB) — the levenshtein-verify codegen
# over the blocked candidate pairs compiles across runs, so best-of-2
# lands on the ramp and swings with whatever JIT pressure preceded it.
EXTRA_RUNS = {"ref_pipeline_scheduleA2": 4, "linkage_fs_scores": 4}


def _run_suite(
    spark, queries, names, sf_dir: str
) -> tuple[dict[str, float], dict[str, list[float]], dict]:
    """Returns (best-per-query, all-run-walls-per-query, quality dict).

    The full per-run walls make in-suite anomalies self-adjudicating:
    run1>>run2 is one-time codegen/JIT, run1~=run2 both slow is
    execution-level (queue pressure, spill, host) — the distinction
    VERDICT r13 could not make for dedup_simhash_hamming from a single
    best-of number.

    Mid-suite mini-canaries (every _MID_CANARY_EVERY queries; a CPU
    codegen probe plus an fsync disk probe) detect a co-tenant
    contention WINDOW (the r14 failure: suite positions 16-23 regressed
    3-6x together); rows whose neighborhood probe exceeded 2x the run's
    median (CPU) or max(3x median, 0.15 s) (disk) are re-timed once
    after the sweep and the min wins, and rows still slower than
    _SLOW_TAIL_S get one more run (short bursts between probe samples
    were observed hitting a single row's both runs with flat probes).
    Both probe series, the requeued names, and all rescue walls ship in
    BENCH_DETAIL so adjudication reads from the artifact."""
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    io_dir = _io_probe_dir(spark)
    _mini_canary(spark)  # warm-up: the first call pays its own codegen
    # the I/O probe warms up too (ADVICE r15): sample 0 otherwise
    # includes first-call overhead (tempfile import, allocator touch)
    _io_mini_canary(probe_dir=io_dir)
    canary_series: list[float] = [_mini_canary(spark)]
    io_series: list[float] = [_io_mini_canary(probe_dir=io_dir)]
    sample_of: dict[str, int] = {}  # query -> index of PRECEDING sample
    for qi, name in enumerate(names):
        fn = queries[name].fn
        # force a collection between queries so each timing reflects the
        # query, not its predecessors' GC debt — standard trial hygiene;
        # measured on the r4 24-query set: best-of-2 totals 19.8s with
        # the inter-query GC vs 20.9s without in the 87-query session,
        # while each query run ISOLATED beats its r4 time (0.91-0.97x).
        spark.sparkContext._jvm.System.gc()
        sample_of[name] = len(canary_series) - 1
        walls: list[float] = []
        for _ in range(EXTRA_RUNS.get(name, 2)):
            start = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(round(time.perf_counter() - start, 3))
        timings[name] = min(walls)
        all_runs[name] = walls
        if (qi + 1) % _MID_CANARY_EVERY == 0:
            canary_series.append(_mini_canary(spark))
            io_series.append(_io_mini_canary(probe_dir=io_dir))
    canary_series.append(_mini_canary(spark))
    io_series.append(_io_mini_canary(probe_dir=io_dir))
    # threshold against the MEDIAN sample, not the min: the ~0.1 s
    # probe has 2-3x natural jitter (first run flagged 132/172 rows
    # off a single fast outlier), while a real contention window (r14:
    # canary 2-4x elevated for minutes) clears 2x median comfortably
    med_c = sorted(canary_series)[len(canary_series) // 2]
    best_c = min(canary_series)
    # I/O flag: 3x median AND a 0.15 s absolute floor — calibrated so
    # the bench's own post-shuffle page-cache flushing (<= 0.071 s
    # measured) can never trip it, only a contending co-tenant.
    med_io = sorted(io_series)[len(io_series) // 2]
    io_thresh = max(3.0 * med_io, 0.15)

    def _bracket(series: list[float], name: str) -> float:
        return max(
            series[sample_of[name]],
            series[min(sample_of[name] + 1, len(series) - 1)],
        )

    contended = [
        name
        for name in names
        # a row is suspect if EITHER bracketing sample saw contention
        # on EITHER probe (CPU-steal or disk)
        if _bracket(canary_series, name) > 2.0 * med_c
        or _bracket(io_series, name) > io_thresh
    ]
    rescued: dict[str, float] = {}
    for name in contended:
        spark.sparkContext._jvm.System.gc()
        start = time.perf_counter()
        queries[name].fn(spark, sf_dir).count()
        wall = round(time.perf_counter() - start, 3)
        all_runs[name].append(wall)
        rescued[name] = wall
        timings[name] = min(timings[name], wall)
    # Slow-tail rescue (round-15 closing): short co-tenant bursts can
    # land BETWEEN probe samples and hit exactly one row's two runs
    # (observed: one 2.6 s-steady row at 13.2/22.7 s with flat probes).
    # The suite number is dominated by its slow tail, so every row
    # whose best still exceeds _SLOW_TAIL_S gets ONE more timed run
    # after the sweep, min wins — capped at the _SLOW_TAIL_MAX slowest
    # rows so a lower-core run (where most rows clear 2 s honestly)
    # adds at most a bounded, tail-focused number of extra runs.
    # Side-effect-free: all walls ship in queries_runs, so the
    # pre-rescue best-of-2 stays reconstructible from the artifact.
    slow_rescued: dict[str, float] = {}
    slow_tail = sorted(
        (n for n in names if timings[n] > _SLOW_TAIL_S),
        key=lambda n: -timings[n],
    )[:_SLOW_TAIL_MAX]
    for name in slow_tail:
        spark.sparkContext._jvm.System.gc()
        start = time.perf_counter()
        queries[name].fn(spark, sf_dir).count()
        wall = round(time.perf_counter() - start, 3)
        all_runs[name].append(wall)
        slow_rescued[name] = wall
        timings[name] = min(timings[name], wall)
    quality = {
        # methodology stamp (ADVICE r15): per-row statistic is min over
        # initial best-of-N runs PLUS requeue/slow-tail rescue runs; a
        # BENCH_DETAIL from harness_version < 3 is plain best-of-N, so
        # adjudication scripts comparing across versions should fall
        # back to the reconstructible pre-rescue best (queries_runs
        # first-N minima — shipped as value_best2 on the contract line)
        "harness_version": 3,
        "statistic": "best-of-2 + probe-requeue + slow-tail rescue (v3)",
        "io_probe_dir": io_dir,
        "io_probe_fstype": _fs_type(io_dir),
        "mid_canaries": canary_series,
        "mid_io_canaries": io_series,
        "mid_canary_every": _MID_CANARY_EVERY,
        "best_mid_canary": best_c,
        "median_mid_canary": med_c,
        "median_mid_io_canary": med_io,
        "io_threshold_s": round(io_thresh, 4),
        "requeued": contended,
        "requeued_walls": rescued,
        "slow_tail_s": _SLOW_TAIL_S,
        "slow_tail_max": _SLOW_TAIL_MAX,
        "slow_tail_rescued": slow_rescued,
    }
    return timings, all_runs, quality


def _run_presteps(spark, sf_dir: str) -> dict[str, float]:
    """Materialize the session-shared caches as NAMED bench rows.

    Round 12 landed one shared co-purchase pair table (and the
    support>=2 twin, and the shingle tables) behind session caches; the
    suite then billed each populate to whichever consumer ran first —
    adamic-adar went 3.53->5.70 s on an engine change that made it
    FASTER.  Running each populate here, timed under its own name,
    makes every consumer row measure the consumer.  The populate cost
    is reported as presteps_s on the headline line (kept OUT of
    `value` — at 100 TB these are build-once shared artifacts, the
    moral equivalent of an index build)."""
    from form700_etl_spark.queries.dedup import (
        MAX_SHINGLE_DF,
        _shingles_cached,
    )
    from form700_etl_spark.queries.scale import (
        _co_pairs_cached,
        _stable_co_edges,
    )

    presteps = {}
    steps = [
        ("cache_co_pairs", lambda: _co_pairs_cached(spark, sf_dir).count()),
        (
            "cache_stable_co_edges",
            lambda: _stable_co_edges(spark, sf_dir)[0].count(),
        ),
        (
            "cache_shingles_uncapped",
            lambda: _shingles_cached(spark, sf_dir).count(),
        ),
        (
            "cache_shingles_capped",
            lambda: _shingles_cached(spark, sf_dir, max_df=MAX_SHINGLE_DF).count(),
        ),
    ]
    for name, thunk in steps:
        start = time.perf_counter()
        try:
            thunk()
        except Exception:
            presteps[name] = -1.0  # populate failed; consumers will rebuild
            continue
        presteps[name] = round(time.perf_counter() - start, 3)
    return presteps


def _r4_fresh_jvm_once(sf_dir: str, subset: str = "r4") -> dict | None:
    """Run a named subset in a FRESH JVM subprocess.

    Round 5's in-suite r4 subtotal inflated ~1.2x purely from single-JVM
    pressure (JIT code cache / heap history of the 111-query suite); every
    query re-measured in a fresh session matched its r4 time.  Running the
    comparable set in its own process makes value_r4_query_set reflect the
    plans, not the session, at the cost of ~30s extra bench wall-clock.
    subset="scheduleA2" runs the plan-build/execution decomposition the
    same way (fresh JVM -> honest plan_build_s and JIT progression).
    """
    import subprocess
    import sys

    try:
        env = os.environ.copy()
        env["SPARK_GRAFT_SF_DIR"] = sf_dir  # honor the caller's dir
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--subset", subset],
            capture_output=True,
            text=True,
            timeout=600,
            env=env,
        )
        if proc.returncode != 0:
            return None
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        return None
    return None


_R4_RUNS = 3


def _scheduleA2_decompose(spark, queries, sf_dir: str) -> dict:
    """Decompose ref_pipeline_scheduleA2 into plan construction vs
    execution (VERDICT r12 task 1): the row's historic 1.26/4.3/9.3/
    12.0/22.6 s spread mixes three regimes with different owners —
    (a) plan BUILD: ~5-7 s of fresh-JVM Catalyst/py4j analysis of the
    ~300-field nested tree, paid once per session (memoized);
    (b) JIT warm-up: the first few EXECUTIONS run the giant generated
    projection interpreted — measured 6.8 s wall / 126 executor-s /
    110 cpu-s for the identical plan+data that later runs at 1.9 s /
    11 executor-s / 8 cpu-s, with zero spill and shuffle flat at
    16.1 MB (tools/profile_scheduleA2.py) — r12's "303 executor-s"
    was this regime;
    (c) steady state: ~2 s at sf0.1, the number that scales.
    Reports each regime separately so round-over-round comparison can
    target (c)."""
    fn = queries["ref_pipeline_scheduleA2"].fn
    start = time.perf_counter()
    df = fn(spark, sf_dir)  # lazy — pure driver-side plan construction
    plan_build_s = round(time.perf_counter() - start, 3)
    execs: list[dict] = []
    for i in range(5):
        before = _stage_totals(spark)
        start = time.perf_counter()
        df.count()
        wall = round(time.perf_counter() - start, 3)
        after = _stage_totals(spark)
        execs.append(
            {
                "wall_s": wall,
                "executor_run_s": round(
                    after["executor_run_s"] - before["executor_run_s"], 1
                ),
                "executor_cpu_s": round(
                    after["executor_cpu_s"] - before["executor_cpu_s"], 1
                ),
                "shuffle_write_mb": round(
                    after["shuffle_write_mb"] - before["shuffle_write_mb"], 1
                ),
            }
        )
    walls = sorted(e["wall_s"] for e in execs)
    return {
        "plan_build_s": plan_build_s,
        "executions": execs,
        "exec_steady_s": walls[0],
        "exec_median_s": walls[(len(walls) - 1) // 2],
        "dominant_term": "jit_warmup_then_steady_state",
    }


def _r4_fresh_jvm(sf_dir: str) -> tuple[dict | None, dict | None]:
    """Median-of-3 fresh-JVM r4 measurement.

    Round 11 measured 17.597 / 18.46 / 19.34 s on BYTE-IDENTICAL code —
    a ~9% spread — and the best-of was committed as a record while the
    driver's single run published the worst-of.  Running the fresh-JVM
    subprocess _R4_RUNS times and reporting the MEDIAN (plus the full
    spread) makes the headline number reproducible: claims are worded
    against the median, and any single-run artifact (the driver's or
    ours) should land inside the published spread.

    Round 15 (VERDICT r14 task 3): if the ex-scheduleA2 relative spread
    exceeds _R4_TARGET_SPREAD, up to _R4_EXTRA more passes run and the
    summary recomputes over all survivors — a contention blip during
    one pass widens the spread, and the extra passes let the quiet-host
    majority outvote it; `extra_passes` in the spread dict records how
    many were spent.

    Returns (median_run_payload, spread_dict)."""
    runs = [r for r in (_r4_fresh_jvm_once(sf_dir) for _ in range(_R4_RUNS)) if r]
    if not runs:
        return None, None
    extra_spent = 0
    while extra_spent < _R4_EXTRA:
        ex = sorted(
            r["value_r4_query_set"] - r["queries"]["ref_pipeline_scheduleA2"]
            for r in runs
            if "ref_pipeline_scheduleA2" in r.get("queries", {})
        )
        if len(ex) >= 2 and ex[0] and (ex[-1] - ex[0]) / ex[0] <= _R4_TARGET_SPREAD:
            break
        extra = _r4_fresh_jvm_once(sf_dir)
        extra_spent += 1
        if extra:
            runs.append(extra)
    ordered = sorted(runs, key=lambda r: r["value_r4_query_set"])
    # lower-middle for even survivor counts: if a subprocess died and 2
    # runs remain, publishing the WORSE one would contradict the
    # "median" claim — lower-middle is the conservative-but-honest pick
    # and equals the true median for odd counts.
    median = ordered[(len(ordered) - 1) // 2]
    values = [r["value_r4_query_set"] for r in ordered]
    # STABLE gate series (VERDICT r13 task 5): the same runs with
    # ref_pipeline_scheduleA2 excluded — its fresh-JVM JIT pathology has
    # its own decomposed measurement (BENCH_DETAIL.scheduleA2_
    # decomposition) and dominated r13's 0.78 relative spread; the gate
    # ratio should be computed on the set that measures the engine.
    # A run record missing the scheduleA2 timing must NOT silently
    # subtract 0 — that would leave the pathology this series exists to
    # exclude INSIDE the "stable" numbers (ADVICE r14).  Exclude such
    # runs from the ex-A2 series and flag them.
    ex_a2_missing = sum(
        1 for r in runs if "ref_pipeline_scheduleA2" not in r.get("queries", {})
    )
    ex_a2 = sorted(
        round(
            r["value_r4_query_set"]
            - r["queries"]["ref_pipeline_scheduleA2"],
            3,
        )
        for r in runs
        if "ref_pipeline_scheduleA2" in r.get("queries", {})
    )
    spread = {
        "runs": values,
        "n_runs": len(values),  # label the mode by what actually survived
        # <3 survivors means the lower-middle "median" is really the
        # better of two runs — flag it instead of publishing silently
        # (ADVICE r13).
        "degraded": len(values) < _R4_RUNS,
        "best": values[0],
        "median": median["value_r4_query_set"],
        "worst": values[-1],
        "rel_spread": round((values[-1] - values[0]) / values[0], 4)
        if values[0]
        else None,
        "runs_ex_scheduleA2": ex_a2,
        "runs_ex_scheduleA2_missing": ex_a2_missing,
        "median_ex_scheduleA2": ex_a2[(len(ex_a2) - 1) // 2] if ex_a2 else None,
        "rel_spread_ex_scheduleA2": round(
            (ex_a2[-1] - ex_a2[0]) / ex_a2[0], 4
        )
        if ex_a2 and ex_a2[0]
        else None,
        "extra_passes": extra_spent,
        "target_spread": _R4_TARGET_SPREAD,
    }
    return median, spread


def main() -> None:
    import sys

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    subset_r4 = "--subset" in sys.argv and "r4" in sys.argv
    subset_a2 = "--subset" in sys.argv and "scheduleA2" in sys.argv

    if not (subset_r4 or subset_a2):
        # Quiet-host gate BEFORE any measurement (r15 task 3): the r14
        # artifact was committed off a loadavg-6-15 run; wait (bounded)
        # for co-tenants to drain and record the trace.
        host_gate = _await_quiet_host()
        # Fresh-JVM passes for the comparable subtotal BEFORE this process
        # builds up suite pressure (and so its JSON can't interleave).
        r4_fresh, r4_spread = _r4_fresh_jvm(sf_dir)
        a2_decomp = _r4_fresh_jvm_once(sf_dir, subset="scheduleA2")
    else:
        host_gate, r4_fresh, r4_spread, a2_decomp = None, None, None, None

    spark = get_spark("form700-etl-spark-bench")
    queries = all_queries()

    if subset_a2:
        out = _scheduleA2_decompose(spark, queries, sf_dir)
        out["metric"] = "scheduleA2_decomposition"
        out["sf"] = sf
        print(json.dumps(out))
        spark.stop()
        return

    # Host-speed canary FIRST — before any suite pressure (see
    # CANARY_REF_S).  The full-suite path re-measures (bounded) until
    # it qualifies at host_factor <= MAX_HOST_FACTOR (r15 task 3).
    if subset_r4:
        canary_s = _canary(spark)
        canary_trace = None
    else:
        canary_s, canary_trace = _qualified_canary(spark)
    host_factor = round(canary_s / CANARY_REF_S, 3)

    # warm up the JVM / parquet footers
    queries["flagship_mktsegment_revenue"].fn(spark, sf_dir).count()

    if subset_r4:
        # Warm-up pass (VERDICT r9 task 1b): run every r4 query ONCE,
        # untimed-for-the-record but recorded as queries_cold, before the
        # timed best-of-2.  Three rounds of byte-identical code swung
        # ref_pipeline_scheduleA2 4.3/9.3/22.6 s fresh-JVM with a flat CPU
        # canary — cold-parquet/page-cache state the canary can't see.
        # The timed region tracks steady-state (the record's stated
        # methodology: every plan runs hot at 100 TB); the cold column plus
        # per-query shuffle/spill/scan deltas make any residual swing
        # self-adjudicating instead of un-diagnosable.
        cold: dict[str, float] = {}
        metrics: dict[str, dict[str, float]] = {}
        for name in R4_SET:
            start = time.perf_counter()
            queries[name].fn(spark, sf_dir).count()
            cold[name] = round(time.perf_counter() - start, 3)
        timings = {}
        for name in R4_SET:
            spark.sparkContext._jvm.System.gc()
            before = _stage_totals(spark)
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                queries[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - start)
            after = _stage_totals(spark)
            timings[name] = round(best, 3)
            # delta over the 2 timed runs -> halve to per-run volumes
            metrics[name] = {
                k: round((after[k] - before[k]) / 2.0, 2) for k in after
            }
        subtotal = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "r4_query_set_seconds",
                    "value_r4_query_set": subtotal,
                    "value_r4_cold_pass": round(sum(cold.values()), 3),
                    "canary_s": canary_s,
                    "loadavg": _loadavg(),
                    "host_factor": host_factor,
                    "value_r4_normalized": round(subtotal / host_factor, 3),
                    "queries": timings,
                    "queries_cold": cold,
                    "queries_metrics": metrics,
                    "sf": sf,
                }
            )
        )
        spark.stop()
        return

    # Streaming throughput FIRST — before the 164-query suite builds up
    # single-JVM pressure (measured: the same drive reads 77.8k ev/s on
    # a fresh session vs 49.5k after the suite).  Steady-state drive
    # (VERDICT r10 task 5): the FULL events table replayed once per
    # micro-batch (8 batches); events_per_s is measured over the
    # post-first-batch window, so it tracks per-batch processing cost,
    # not JVM/state-store startup (the r<=10 single-batch number was
    # startup-dominated and swung 38.8-66.2k on identical code; the
    # first v2 cut split the table into 8 small slices and measured
    # per-batch machinery instead of processing).
    from form700_etl_spark.streaming.events_stream import (
        bench_tumbling_throughput,
    )

    streaming = {}
    for _ in range(2):
        run = bench_tumbling_throughput(spark, sf_dir, n_batches=8)
        if not streaming or run["events_per_s"] > streaming["events_per_s"]:
            streaming = run
    streaming["method"] = "steady_state_v3_fulltable_8batch"

    # Named cache-populate rows BEFORE the suite, so shared-cache costs
    # are attributed to the populate, not the first consumer (VERDICT
    # r12 task 2).
    presteps = _run_presteps(spark, sf_dir)

    timings, query_runs, suite_quality = _run_suite(
        spark, queries, HEADLINE, sf_dir
    )
    # EXTRA_RUNS queries get best-of-4 while everything else is
    # best-of-2 (ADVICE r13): publish BOTH so per-row cross-round
    # comparison stays uniform — best2 is what a best-of-2 rule would
    # have recorded, best (== timings[name]) is the steady-state row.
    extra_runs_best2 = {
        n: min(query_runs[n][:2]) for n in EXTRA_RUNS if n in query_runs
    }

    total = round(sum(timings.values()), 3)
    # Pre-rescue total (VERDICT r15): what the r14-era best-of-N rule
    # (2 runs, or EXTRA_RUNS for the JIT-ramp rows) would have recorded
    # — the requeue/slow-tail rescues only ever lower `value`, so
    # cross-round comparison against a pre-v3-harness artifact should
    # use THIS number; both ride the contract line.
    value_best2 = round(
        sum(
            min(query_runs[n][: EXTRA_RUNS.get(n, 2)])
            for n in timings
        ),
        3,
    )
    in_suite_r4 = round(sum(timings[n] for n in R4_SET), 3)
    # value_r4_query_set: the apples-to-apples round-over-round number,
    # measured in its own fresh JVM (see _r4_fresh_jvm).  Falls back to
    # the in-suite subtotal if the subprocess failed for any reason.
    if r4_fresh is not None:
        r4_value = r4_fresh["value_r4_query_set"]  # median of surviving runs
        r4_mode = "fresh_jvm_median_of_%d" % (
            (r4_spread or {}).get("n_runs", _R4_RUNS)
        )
        if (r4_spread or {}).get("degraded"):
            r4_mode += "_degraded"  # <3 survivors: min-of-2, not a median
        # normalize the fresh-JVM number with the fresh JVM's OWN canary
        r4_host_factor = r4_fresh.get("host_factor", host_factor)
    else:
        r4_value = in_suite_r4
        r4_mode = "in_suite_fallback"
        r4_host_factor = host_factor

    detail = {
        "queries": timings,
        "queries_runs": query_runs,
        "extra_runs_best2": extra_runs_best2,
        "presteps": presteps,
        "host_gate": host_gate,
        "canary_trace": canary_trace,
        "suite_quality": suite_quality,
        "scheduleA2_decomposition": a2_decomp,
        "r4_fresh_jvm": r4_fresh,
        "r4_spread": r4_spread,
        "value_r4_in_suite": in_suite_r4,
        "streaming": streaming,
        "sf": sf,
        "method": (
            "best-of-2 per query (steady-state; scheduleA2 best-of-4, see"
            " EXTRA_RUNS); shared-cache populates timed as presteps, kept"
            " out of value; r4 set + scheduleA2 decomposition in fresh JVMs"
        ),
        # the r4 set gained an untimed warm-up pass in round 10, which
        # makes value_r4_query_set steady-state-only; tag the change so
        # BENCH_r* consumers can't silently compare across it (rounds
        # <=9 were cold-inclusive = "cold_v1").
        "r4_methodology": "warmed_v2",
    }
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo_dir, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # Compact per-query map (VERDICT r15 task 2): one flat {name: best_s}
    # dict, 0.01 s resolution, as BOTH a small committed artifact
    # (BENCH_QUERIES.json, referenced from the contract line) and its own
    # stdout line — so per-query speedup/scaling comparison never needs
    # BENCH_DETAIL archaeology.  It stays OFF the final contract line:
    # the driver's tail capture holds ~2000 bytes (round 5's giant final
    # line overflowed it and killed that round's bench record), and 172
    # query names alone exceed that.
    per_query = {n: round(t, 2) for n, t in sorted(timings.items())}
    with open(os.path.join(repo_dir, "BENCH_QUERIES.json"), "w") as f:
        json.dump(
            {"metric": "per_query_seconds", "queries": per_query,
             "value_best2": value_best2, "sf": sf},
            f, indent=1, sort_keys=True,
        )
    # Per-query map on an EARLIER stdout line (round 5's single giant line
    # overflowed the driver's tail capture and killed the bench record);
    # the LAST line below stays compact (~1 KB) and fully parseable.
    print(json.dumps({"bench_detail": detail}))
    print(
        json.dumps(
            {"metric": "per_query_seconds", "queries": per_query, "sf": sf},
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                # pre-rescue best-of-N total (same rows): the number a
                # harness_version<3 run would have recorded — use for
                # cross-round comparison against pre-rescue artifacts
                "value_best2": value_best2,
                "unit": "sec",
                "n_queries": len(HEADLINE),
                "queries_file": "BENCH_QUERIES.json",
                # shared-cache populates: timed separately, not in value
                "presteps_s": round(
                    sum(v for v in presteps.values() if v > 0), 3
                ),
                "value_r4_query_set": r4_value,
                # the STABLE gate number: same runs minus scheduleA2's
                # fresh-JVM JIT pathology (decomposed separately in
                # BENCH_DETAIL.scheduleA2_decomposition)
                "value_r4_ex_scheduleA2": (r4_spread or {}).get(
                    "median_ex_scheduleA2"
                ),
                "r4_mode": r4_mode,
                "r4_spread": r4_spread,
                # canary on the HEADLINE line too (VERDICT r9 task 1a):
                # host speed adjudication without digging into the detail.
                # canary_s = THIS suite process; r4_canary_s = the fresh
                # JVM that measured value_r4_query_set (its own canary is
                # the one value_r4_normalized divides by).
                "canary_s": canary_s,
                "loadavg": _loadavg(),
                "host_factor": host_factor,
                # self-qualification summary (r15 task 3): did the gate
                # pass, did the canary qualify, and how many suite rows
                # needed a post-sweep rescue run
                "host_gate_passed": (host_gate or {}).get("passed"),
                "canary_qualified": (canary_trace or {}).get("qualified"),
                "n_requeued": len(suite_quality.get("requeued", [])),
                "r4_canary_s": (r4_fresh or {}).get("canary_s", canary_s),
                "r4_loadavg": (r4_fresh or {}).get("loadavg"),
                "value_r4_normalized": round(r4_value / r4_host_factor, 3),
                "r4_methodology": "warmed_v2",
                "streaming_events_per_s": streaming["events_per_s"],
                "streaming_method": streaming["method"],
                "sf": sf,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
