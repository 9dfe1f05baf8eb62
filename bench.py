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
brackets run before, mid-run, and after; their minimum normalizes the
regression gate.

Fail-soft per query: a query that raises is recorded under "errors"
with its exception and EXCLUDED from the total, but never aborts the
run — one broken query must not zero the whole artifact (round-3
lesson: the NTZ regression killed the bench before a single timing).

Regression gate (round-5): every query has a recorded anchor time
(ANCHORS — r2 artifact values where the query existed in r2, else the
round-5 idle-box measurement). A fixed CALIBRATION workload — pure
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

# Anchor seconds at sf0.1. Source "r2": BENCH_r02.json (the last
# uncontested bench artifact); source "r5": idle-box (loadavg < 0.5)
# measurement at the round-5 commit that introduced the table cache —
# queries added after r2 have no r2 number.
ANCHORS: dict[str, float] = {
    "q1_pricing_summary": 1.331,       # r2
    "q5_region_revenue": 1.541,        # r2
    "cumulative_revenue": 0.815,       # r2
    "ordered_reduction_reset": 1.166,  # r2
    "fluxcal_multiplier": 1.077,       # r2
    "dedup_exact": 0.781,              # r2
    "text_quality": 0.780,             # r2
    "cosine_topk": 1.053,              # r2
    "events_tumbling_window": 0.793,   # r2
    "delay_rules_engine": 0.853,       # r2
    "sessionization": 0.873,           # r2
    "knn_per_label": 1.210,            # r2
    "scrunch_operator": 0.920,         # r2
    "pdmp_snr_operator": 1.723,        # r2
    "minhash_lsh_pairs": 1.675,        # r2
    "embedding_near_dup": 1.398,       # r2
    "ivf_search": 1.696,               # r2
    "kepler_ell1_chain": 0.665,        # r2
    "astro_coords": 0.817,             # r2
    "pipeline_results_json": 2.300,    # r5
    "bucketed_colocated_join": 0.301,  # r5
    "asof_join_events": 0.253,         # r5
    "binned_interval_join": 0.329,     # r5
    "hll_distinct_shingles": 1.568,    # r5
    "bloom_contamination_check": 1.853,  # r5
    # re-anchored r5w5: a frozen-checkout A/B showed the original 0.142
    # was a lucky measurement — the ANCHOR commit itself times 0.371 on
    # today's idle box while HEAD times 0.305 (no code regression).
    "paragraph_dedup_docs": 0.305,     # r5w5 (A/B re-anchor)
    "duplicate_spans_docs": 0.211,     # r5
    "temperature_mixture_resample": 0.567,  # r5
    "pca_top2_projection": 0.732,      # r5
    "sampled_quantiles_lineitem": 0.479,  # r5
    "doc_chunks": 0.210,               # r5
    "cdc_chunks_docs": 1.713,          # r5
    "funnel_view_click_purchase": 0.556,  # r5
    "ewma_user_values": 0.270,         # r5
    "cohort_retention_weekly": 0.581,  # r5
    "quality_gate_gopher": 0.203,      # r5
    "q17_small_quantity_revenue": 0.354,   # r5w4
    "q18_large_volume_orders": 0.614,      # r5w4
    "psi_drift_events": 0.718,             # r5w4
    "pq_adc_search": 9.769,                # r5w4 (train+encode+search e2e)
    "pagerank_customer_supplier": 7.120,   # r5w4 (10 checkpointed rounds)
    "bigram_perplexity_docs": 3.673,       # r5w4
    "hard_negative_mining": 7.517,         # r5w4 (kmeans + pair window)
    # same computation as hard_negative_mining at sf0.1 (auto-k = 8
    # there), so the pinned lane's anchor carries over; diverges to the
    # two-level path only above n ≈ 8k
    "hard_negative_mining_autok": 7.517,
    "ppjoin_jaccard_pairs": 1.700,         # r5w4 (warm-session steady state)
    # r5w5: measured at the wave-5 commit with ab_ratio 1.146 and divided
    # out (loadavg 4.7 during the 52-query run), so these approximate the
    # idle-box convention of the rows above.
    "q21_waiting_suppliers": 1.04,         # r5w5
    "bpe_train_merges": 2.55,              # r5w5 (8 vocab-sized merge steps)
    "table_diff_orders": 0.55,             # r5w5
    "triangle_count_parts": 7.67,          # r5w5 (wedge join O(m^1.5); oriented edges checkpointed)
    "event_transitions": 0.30,             # r5w5
    "skew_profile_users": 0.20,            # r5w5
    "nb_langid_confusion": 2.17,           # r5w5 (train + self-score)
    "sequence_pattern_funnels": 0.30,      # r5w5
    "brand_trend_ols": 0.86,               # r5w5 (warm best-of-3, idle box)
    "lpa_communities": 9.10,               # r5w5 (4 checkpointed rounds)
    "entity_match_customers": 4.17,        # r5w5 (deletion join, hashed variant keys)
    "image_dhash_roundtrip": 0.33,         # r5w5
    "audio_frame_features_pcm": 0.40,      # r5w5
    "seasonal_anomaly_hours": 0.52,        # r5w5
    "association_rules_parts": 2.30,       # r5w5
    "last_touch_attribution": 0.42,        # r5w5
    "grouping_sets_revenue": 0.34,         # r5w5
    "q2_min_cost_supplier": 1.10,          # r5w5
    "q11_important_parts": 0.60,           # r5w5
    "corpus_build_e2e": 6.61,              # r5w5 (7-stage lifecycle + CC; shingle table persisted once)
    "dm_fit_operator": 0.236,              # r6 (measured/ab)
    "rm_fit_operator": 0.222,              # r6 (measured/ab)
    "timing_model_fit_operator": 0.530,    # r6 (measured/ab)
    "results_doc_full": 1.730,             # r6 (measured/ab)
    "media_feature_extract_png": 0.475,    # r6 (measured/ab)
    "template_match_toa_operator": 0.419,  # r6 (measured/ab)
    "toa_dm_pipeline_e2e": 0.786,          # r6 (measured/ab)
    "dynspec_acf_2d": 0.581,               # r6 (measured/ab)
    "rm_synthesis_spectrum": 1.576,        # r6 (measured/ab)
    "polarimetry_profile_e2e": 0.587,     # r6 (measured/ab)
    "rm_refine_e2e": 1.968,                # r7 (idle best-of-3)
    "quality_logreg_train": 6.185,         # r7 (idle best-of-3)
}

# Idle-box seconds for the calibration workload (min of 3), pinned at the
# same round-5 measurement session as the r5 anchors above.
CALIBRATION_ANCHOR_SEC = 0.102


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

    cal_before = _calibrate(spark)

    # Per-query BEST-OF-3 (VERDICT r8 item 5): the shared box swung
    # 0.8x-1.9x of the calibration anchor within single r8 sessions, so
    # at best-of-2 a genuine 1.5x regression on a sub-second query was
    # indistinguishable from one load spike. A third run costs ~40% more
    # wall clock and makes the recorded minimum robust to two spikes.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    cal_mid = float("inf")
    for i, name in enumerate(names):
        best = float("inf")
        for _ in range(3):
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
        if i == len(names) // 2:
            # mid-run calibration: with only before/after brackets, a
            # load hump confined to the middle of the window is invisible
            cal_mid = _calibrate(spark)

    # Calibration AFTER the queries: min of the three brackets is the
    # box's best observed speed during the measured window.
    cal_after = _calibrate(spark)
    cal = min(cal_before, cal_mid, cal_after)
    ab_ratio = round(cal / CALIBRATION_ANCHOR_SEC, 3)

    regressions: dict[str, float] = {}
    for name, t in timings.items():
        anchor = ANCHORS.get(name)
        if anchor is None:
            continue
        # normalize by box speed; never normalize downward past the raw
        # ratio (a fast box should not hide a real regression)
        ratio = t / (anchor * max(ab_ratio, 1.0))
        if ratio > 2.0:
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
