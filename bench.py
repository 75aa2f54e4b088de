"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Two sections:

- HEADLINE is the stable round-over-round set (unchanged since round 1, so
  `value` stays comparable across BENCH_r{N}.json files).
- EXTENDED covers the round-3/4 additions that previously had no
  round-over-round perf signal; its per-query times ride along in the JSON
  under "extended" without perturbing the headline metric.

Timings are best-of-3 per query: the first run pays codegen/JIT, and a
third sample absorbs transient host-load spikes (round 4's tail-of-bench
"regressions" turned out to be exactly that — the same queries measure
0.2-0.3s in a quiet session).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — grouped agg, multi-join+topk,
# window, rollup, general reducer, join-agg, dedup (exact + LSH), knn, text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "customer_order_stats",
    "topk_orders_per_cust",
    "moving_avg_events",
    "rollup_lineitem",
    "rollup_callbacks",
    "secondary_sort_orders",
    "embedding_cosine_dups",
    "wordcount",
    "dedup_exact_docs",
    "near_dedup_survivors",
    "minhash_lsh_dedup",
    "knn_bruteforce",
    "lsh_cosine_pairs",
    "token_stats_docs",
    "windowed_agg_events",
    "sessionize_events",
    "salted_agg_events",
    "interval_join_events",
]

# The three most expensive catalog shapes, promoted out of EXTENDED in
# round 7 so the round-over-round signal covers them at headline rigor
# (best-of-3). Kept OUT of the frozen `value` total — r01-r06 totals
# never included them — and reported under "heavy" with their own total.
HEAVY = [
    "curation_pipeline",
    "dedup_index_lifecycle",
    "incremental_dedup_batch",
]

# Round-3/4 additions: tracked for round-over-round movement but kept out of
# the headline total so `value` stays comparable with BENCH_r01..r04.
EXTENDED = [
    "winnow_fingerprints_docs",
    "bucketed_join_orders",
    "simhash_dedup",
    "dedup_ngram_jaccard",
    "lang_id_docs",
    "quality_scores_docs",
    "pii_redact_docs",
    "repetition_stats_docs",
    "video_frames_real_decode",
    # md5-portable (headline) vs xxhash64 production hash family — the
    # portability tax, measured round over round
    "minhash_lsh_dedup_fast",
    "pack_sequences_docs",
    "decontaminate_docs",
    "semantic_dedup_embeddings",
    "training_prep_pipeline",
    "tf_idf_docs",
    "epoch_shuffle_docs",
    "asof_join_events",
    "funnel_events",
    "cohort_retention_events",
    "column_profile_docs",
    "resize_images_raw",
    "lm_perplexity_docs",
    # round-6 additions
    "mixture_sample_docs",
    "quantile_filter_docs",
    "group_sample_docs",
    "upsert_customers",
    "latest_event_per_user",
    "scd2_user_type_history",
    "data_quality_orders",
    "video_scene_cuts",
    "audio_dominant_hz",
    # fuzzy_pairs_parts is deliberately NOT benched: at sf0.1 the part
    # names (7-12 chars over a tiny vocabulary) put ~5.5M pairs within
    # d=2, so the query's RESULT is quadratic-sized there — a fixture
    # property, not an operator cost. Correctness stays gated at sf0.01
    # (53k pairs) and was verified once at sf0.1 vs the naive oracle.
    "dedup_exact_best_docs",
    # round-7 additions
    "bloom_prune_join_lineitem",
    "line_dedup_docs",
    "dataset_diff_customers",
    "salted_join_lineitem",
    "agg_state_orders",
    "naive_bayes_docs",
    "pagerank_supplier_part",
    "inverted_index_docs",
    "cooccurrence_docs",
    "triangle_count_parts",
    # md5-portable (oracled) vs xxhash64 production edge sample — the
    # DOULION perf claim (approx ≤ exact) is measured on the fast twin;
    # the portable twin carries the value oracle and the md5 tax
    "triangle_count_approx_parts",
    "triangle_count_approx_parts_fast",
    "bm25_docs",
    # end-to-end retrieval: 4 queries × top-10 over shared corpus stats
    "bm25_search_docs",
    "resample_events",
    # round-8: count-min sketch family (portable grid estimate; fast
    # sketch-pruned exact heavy hitters over bigrams)
    "cms_word_counts_docs",
    "cms_heavy_hitters_docs",
    # round-8: hash-sampled quantile estimation + per-group closed-form
    # OLS (exact-integer sums)
    "approx_quantiles_events",
    "linreg_user_trends",
    "corr_event_value_time",
    # round-8: AllPairs/PPJoin prefix-filtered exact set-similarity join
    "setsim_jaccard_docs",
    # round-8: algebraic z-score outliers; sample-sort global row ids
    "zscore_outliers_events",
    "stable_ids_orders",
    # round-8: journeys + drift + robust stats + histogram
    "funnel_report_events",
    "activity_cohorts_events",
    "category_drift_orders",
    "robust_outliers_events",
    "histogram_events",
    # round-8: transitions + winsorize + native hopping windows
    "event_transitions",
    "winsorize_events",
    "hopping_window_events",
    # round-8: iterative k-core (pagerank unrolling contract) + basket lift
    "kcore_parts",
    "basket_lift_parts",
    # round-8: exact cross-relation set-similarity (probe x corpus)
    "setsim_join_docs",
    "equidepth_histogram_events",
    "attribution_events",
    "json_props_stats",
    "observability_pipeline",
    "session_paths_events",
    "pit_state_events",
    "kmv_state_lineitem",
    "containment_join_docs",
    "running_revenue_orders",
    "weighted_sample_orders",
    "pareto_class_customers",
    "melt_order_stats",
    "trimmed_mean_events",
    # k-truss is NOT benched at sf0.1: two full triangle enumerations at
    # 760k co-purchase edges are the measured ~130s exact-triangle bill
    # x2 (SCALE.md) — an inherent Theta(E^1.5) cost, not a plan defect.
    # Correctness stays gated at sf0.001 + sf0.01.
    # round-8 continuation wave: substring-level dedup, fold-sorted EWMA,
    # frontier BFS, hash-walk negative sampling, group admission gate
    "duplicate_spans_docs",
    "ewma_events",
    "bfs_hops_parts",
    "negative_sample_orders",
    "source_gate_docs",
    "cascade_delete_customers",
    # 8-bit scalar quantization: ADC search + error audit
    "quantized_knn_embeddings",
    "quantization_error_embeddings",
    # best_match_parts is NOT benched at sf0.1 (17s): its d=2 candidate
    # volume inherits the fuzzy_pairs_parts fixture property (tiny name
    # vocabulary -> ~5.5M candidates); the RESULT is bounded (one row
    # per left part) and correctness stays gated at sf0.001 + sf0.01.
    # 2-D Pareto frontier via sample-sort suffix-max carry
    "skyline_parts",
    # ANN eval harness: recall@5 of 8-bit ADC vs exact brute force
    "ann_recall_embeddings",
    # BPE tokenizer training (3 unrolled merge rounds, full value oracle)
    "bpe_merges_docs",
    # wave-7/8 additions: streaming/window/graph/ml/retrieval extensions
    "welch_ab_events",
    "active_streaks_events",
    "join_view_delta_orders",
    "item_cf_parts",
    "lpa_communities_parts",
    "cusum_events",
    "bpe_encode_docs",
    "bpe_token_ids_docs",
    "kmeans_embeddings",
    # link_prediction_parts is NOT benched at sf0.1 (53s): exact
    # common-neighbor counting on the dense co-purchase graph is the
    # inherent Theta(sum C(deg,2)) wedge stream (~8e7 rows) — the
    # documented production path is max_apex_degree (measured 10x
    # numbers in SCALE.md); correctness stays gated at both driver SFs.
    "hybrid_search_docs",
    "holt_events",
    "audio_silence_docs",
    "ppr_supplier_part",
    "temporal_split_events",
    "hashed_features_docs",
    "target_encode_orders",
    "target_encode_loo_orders",
    "novelty_docs",
    "bigram_lm_docs",
    "image_dhash_docs",
    "kaplan_meier_events",
    "mannwhitney_ab_events",
    "backtest_forecast_events",
    "vocab_coverage_docs",
    "golden_record_customers",
    "kmv_intersect_lineitem",
    # er_clusters_parts is NOT benched at sf0.1: the levenshtein blocking
    # pass dominates it exactly like the excluded fuzzy_pairs_parts
    # (measured 53.8s at 10x, linear); correctness gated at both driver SFs.
    # round-9 additions: persisted-ANN-index lifecycle, end-to-end
    # tokenizer release, production BPE trainer vs the distributed oracle
    "ivf_index_lifecycle",
    "tokenizer_release_docs",
    "bpe_local_merges_docs",
    # round-9 session-2 additions: governance + analytics + retrieval
    "k_anonymity_customers",
    "kanon_release_customers",
    "rfm_customers",
    "seasonal_decompose_events",
    "hits_supplier_part",
    "assortativity_parts",
    "image_neardup_docs",
    "hard_negatives_embeddings",
    "acf_events",
    "changepoint_events",
    "theil_sen_events",
    "ri_audit_tpch",
    "pseudonymize_customers",
    "benford_orders",
    "gini_customer_revenue",
    "phrase_search_docs",
    "cluster_topics_embeddings",
    "ams_f2_lineitem",
    "decision_stump_orders",
    "span_corruption_docs",
    "fd_violations_events",
    "histogram_drift_orders",
    "collocations_docs",
    # lsh_recall_docs is NOT benched: it runs two full dedup pipelines,
    # both of which are already benched individually.
    "audio_segments_docs",
    "ks_test_events",
    "auc_events",
    "pr_curve_events",
    "calibration_events",
    "embedding_drift_labels",
    "rank_family_orders",
    "governance_report",
    # sorted_neighborhood_parts is NOT benched at sf0.1: the pair VERIFY
    # volume (n·w levenshteins over near-identical synthetic names) is
    # the same measured levenshtein wall as the excluded fuzzy_pairs /
    # er_clusters; correctness gated at both driver SFs.
    # round-10 session-2 additions: one-pass uncertainty, DP release,
    # embedding covariance, TWAP, z-order layout audit
    "poisson_bootstrap_events",
    "dp_histogram_customers",
    "covariance_embeddings",
    "twap_events",
    "zorder_layout_lineitem",
    "chisq_customers",
    "cohens_kappa_events",
    "mixture_plan_docs",
    "quantile_normalize_events",
    "cms_join_size_lineitem",
    "windowed_quantiles_events",
    "weighted_median_lineitem",
    # round-10 wishlist additions: event-time windowed dedup + the
    # plan-cache build/replay lifecycle
    "windowed_dedup_events",
    "plan_cache_replay_orders",
    # round-10 session-3 additions: information theory, shape stats,
    # sketch quantiles, recipes/eval/governance, incremental SCD2
    "mutual_info_events",
    "feature_mi_orders",
    "woe_iv_orders",
    "token_entropy_docs",
    "unigram_kl_docs",
    "moments_events",
    "zipf_fit_docs",
    "histogram_quantiles_lineitem",
    "mixture_temperature_docs",
    "ranking_metrics_events",
    "cuped_orders",
    "raking_customers",
    "scd2_apply_events",
    # round-10 session-4 additions: portable HLL, governance t-closeness,
    # causal readouts, range-partitioner planning, PSI drift
    "hll_distinct_lineitem",
    "t_closeness_customers",
    "did_events",
    "smd_balance_events",
    "range_bounds_lineitem",
    "psi_drift_orders",
    "nelson_aalen_events",
    "brier_events",
    "uplift_deciles_events",
    # round-10 session-5 additions: classifier report, rank correlation,
    # survival test, causal estimators, forecast scores, TextRank
    "classification_report_events",
    "spearman_events",
    "logrank_events",
    "ipw_ate_events",
    "qte_events",
    "forecast_accuracy_events",
    "textrank_docs",
    "cmh_events",
    "ratio_delta_events",
    "krippendorff_events",
    "eb_rate_parts",
    "power_analysis_events",
    "padding_efficiency_docs",
]

RUNS_PER_QUERY = 3


def _run_section(
    spark,
    sf_dir: str,
    names: list[str],
    runs: int = RUNS_PER_QUERY,
    runs_achieved: dict[str, int] | None = None,
    loadavg_per_query: dict[str, float] | None = None,
) -> dict[str, float]:
    from pangool_spark.queries import QUERIES

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        best, n, achieved = float("inf"), 0, 0
        # best-of-N: run 1 pays codegen/JIT, run 3 absorbs host-load spikes.
        # clearCache keeps one query's materialized intermediates from
        # occupying storage during the next query's runs.
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.time() - t0)
            achieved += 1
        timings[name] = round(best, 3)
        if runs_achieved is not None:
            runs_achieved[name] = achieved
        if loadavg_per_query is not None:
            # 1-min loadavg sampled as each query finishes: contamination
            # arriving MID-run (the r11 artifact's poisoned back half) is
            # then identifiable in-band instead of inferrable only from
            # start/end stamps. Note the bench's own 32 worker threads
            # contribute to this number while stages are in flight — read
            # it relative to neighboring queries, not as an absolute gate.
            loadavg_per_query[name] = round(os.getloadavg()[0], 2)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pangool_spark.session import get_spark
    from pangool_spark.queries import clear_shingle_cache

    # Load gate (round-11, after two consecutive rounds committed
    # load-inflated artifacts: r09 +15-30% uniform, r10 ~2x at loadavg
    # 3.2 while the same code measured 11.65s on an idle box). Stamping
    # the loadavg made contamination VISIBLE; this makes the committed
    # number trustworthy by construction: refuse to start while the
    # 1-min loadavg is above 1.0, polling up to 10 minutes. If the host
    # never quiets, run anyway but stamp an explicit waiver field so the
    # artifact says in-band that its timings are load-inflated.
    gate_threshold, gate_timeout, poll_s = 1.0, 600.0, 15.0
    waited = 0.0
    load_start = round(os.getloadavg()[0], 2)
    while load_start > gate_threshold and waited < gate_timeout:
        print(
            f"# loadavg {load_start} > {gate_threshold} — waiting "
            f"{poll_s:.0f}s for a quiet host ({waited:.0f}s/"
            f"{gate_timeout:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(poll_s)
        waited += poll_s
        load_start = round(os.getloadavg()[0], 2)
    load_waiver = None
    if load_start > gate_threshold:
        load_waiver = (
            f"loadavg stayed > {gate_threshold} after {gate_timeout:.0f}s "
            "wait — timings are load-inflated; compare against an "
            "idle-box capture before reading movement as engine drift"
        )
        print(f"# WAIVER: {load_waiver}", file=sys.stderr)

    spark = get_spark("pangool_spark_bench")

    # Warm the JVM + parquet footers once so timings measure the queries.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    runs_achieved: dict[str, int] = {}
    loadavg_per_query: dict[str, float] = {}
    timings = _run_section(
        spark, sf_dir, HEADLINE, runs_achieved=runs_achieved,
        loadavg_per_query=loadavg_per_query,
    )
    total = round(sum(timings.values()), 3)

    # Section boundary: evict the dedup suite's cached shingle relations so
    # each section starts from a clean storage-memory slate.
    clear_shingle_cache(spark)
    # the heavy trio gets headline rigor (best-of-3) but stays out of the
    # frozen `value` total, which r01-r06 never included them in
    heavy = _run_section(
        spark, sf_dir, HEAVY, runs_achieved=runs_achieved,
        loadavg_per_query=loadavg_per_query,
    )
    clear_shingle_cache(spark)
    # best-of-2 for the (long) extended section: keeps total bench wall
    # time bounded as the catalog grows; headline stays best-of-3 for
    # round-over-round comparability.
    extended = _run_section(
        spark, sf_dir, EXTENDED, runs=2, runs_achieved=runs_achieved,
        loadavg_per_query=loadavg_per_query,
    )
    clear_shingle_cache(spark)
    # The _fast twins exist purely as a perf claim (xxhash64 vs the
    # md5-portable oracle family), so their numbers must be quieter than
    # best-of-2: the r09 artifact showed a 2x load-noise swing on
    # minhash_lsh_dedup_fast that read as a regression (an interleaved
    # idle-box A/B found the twins statistically tied at sf0.1 — the
    # md5 tax is below shuffle noise at this scale). 3 extra runs each,
    # min folded in.
    fast_twins = [
        "minhash_lsh_dedup_fast",
        "triangle_count_approx_parts_fast",
    ]
    extra = _run_section(spark, sf_dir, fast_twins, runs=3)
    for name in fast_twins:
        extended[name] = min(extended[name], extra[name])
        runs_achieved[name] = runs_achieved.get(name, 0) + 3
    clear_shingle_cache(spark)

    # Production tokenizer training at a REAL merge count (not the
    # catalog's oracled 3-round form): one distributed (word, count)
    # collapse + the guarded in-memory merge loop. Single run — the
    # trainer is a one-shot job, and the point of the number is that
    # 1000 merges cost seconds, not 1000 Spark jobs.
    from pangool_spark.operators.text import bpe_merges_local

    spark.catalog.clearCache()
    t0 = time.time()
    _m, seg = bpe_merges_local(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), n_merges=1000
    )
    n_seg = seg.count()
    extended["bpe_merges_local_1000"] = round(time.time() - t0, 3)
    runs_achieved["bpe_merges_local_1000"] = 1
    print(
        f"# bpe_merges_local_1000: {len(_m)} merges / {n_seg} vocab rows "
        f"in {extended['bpe_merges_local_1000']:.2f}s",
        file=sys.stderr,
    )

    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "heavy": heavy,
        "heavy_total_sec": round(sum(heavy.values()), 3),
        "extended": extended,
        "extended_total_sec": round(sum(extended.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Methodology, frozen as of round 5: headline best-of-3,
        # extended best-of-2 per query. r01-r04 were single-run, so
        # cross-round headline comparisons vs those rounds partly
        # reflect the sampling change; r05+ are like-for-like.
        # "heavy" (new in r07) runs best-of-3; its queries moved out
        # of "extended", where r06 timed them best-of-2.
        "runs": RUNS_PER_QUERY,
        "runs_heavy": RUNS_PER_QUERY,
        "runs_extended": 2,
        "runs_achieved": runs_achieved,
        # per-query 1-min loadavg stamps (r12, judge-ordered): full detail
        # rides in BENCH_LOCAL.json; the compact stdout line carries the
        # headline+heavy subset so contaminated spans are visible even if
        # the driver only captures stdout.
        "loadavg_per_query": loadavg_per_query,
        "loadavg_start": load_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
        # None when the start gate passed (loadavg <= 1.0); otherwise an
        # explicit statement that this artifact's timings are inflated.
        "loadavg_waiver": load_waiver,
        "loadavg_gate_waited_sec": round(waited, 1),
    }
    line = json.dumps(payload)
    # Persist the FULL artifact (incl. the 150+-entry extended dict) in
    # the repo — the judge reads per-query detail from here.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as f:
            f.write(line + "\n")
    except OSError as exc:  # read-only checkout: stdout still carries it
        print(f"# BENCH_LOCAL.json not written: {exc}", file=sys.stderr)
    # stdout gets ONE COMPACT line: the extended per-query dict grew past
    # the driver's capture buffer three rounds running (BENCH_r07/r08/r09
    # all parsed=null), orphaning even the headline totals. Dropping the
    # per-query extended detail (totals + count stay) keeps this line a
    # guaranteed-parseable ~1.5 KB whatever the driver truncates; the
    # full record lives in BENCH_LOCAL.json above.
    compact = {
        k: v
        for k, v in payload.items()
        if k not in ("extended", "runs_achieved", "loadavg_per_query")
    }
    compact["loadavg_per_query"] = {
        name: loadavg_per_query[name]
        for name in [*HEADLINE, *HEAVY]
        if name in loadavg_per_query
    }
    compact["extended_count"] = len(extended)
    compact["extended_detail"] = "BENCH_LOCAL.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
