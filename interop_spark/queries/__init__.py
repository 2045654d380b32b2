"""Named query registry — merges all query modules.

Each module contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL twin). Names missing from ``ORACLE`` get
the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators; prefixed ``ro_``).
"""

from __future__ import annotations

import importlib

_MODULES = (
    "interop_spark.queries.pipeline",
    "interop_spark.queries.pipeline_ext",
    "interop_spark.queries.temporal_q",
    "interop_spark.queries.reshape",
    "interop_spark.queries.fhir_queries",
    "interop_spark.queries.relational_ext",
    "interop_spark.queries.sqlapi",
    "interop_spark.queries.relational",
    "interop_spark.queries.functions_battery",
    "interop_spark.queries.selection_q",
    "interop_spark.queries.corpus_ext",
    "interop_spark.queries.analytics_q",
    "interop_spark.queries.linkage_q",
)

# --------------------------------------------------------------------------
# Driver check-window rotation (the driver's correctness gate covers the
# FIRST 50 registry entries; dicts preserve insertion order).
#
# Invariant, re-stated and applied every round: every query that is NEW
# this round, plus every query whose RESULT could be affected by this
# round's diffs — judged module-granularly over the query's transitive
# imports, with any finer-than-module claim justified per-diff below —
# sits inside the first 50; everything past 50 has a green row in a
# prior CORRECTNESS file AND its code is unchanged since that check.
# Belt and suspenders: `tests/driver_sim.py` runs ALL queries against
# their oracles locally each round (round 11: ALL MATCH at sf0.01; see
# STATUS.md). Window tuples and per-round rationale for rounds 5-10
# live in git history (prior revisions of this block — trimmed per
# ADVICE r9 #3 / r10 verdict item 8; history belongs in git log).
#
# ROUND-12 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-13 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-14 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-15 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-16 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-17 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-18 window and rationale: git history (this block's prior
# revision), per the trimming convention adopted in r9.
#
# ROUND-19 window (50): executes the r18 verdict's queue exactly.
#   * REGISTERED FROM STAGING (4, the whole staged set per verdict
#     item 1): cohort_retention_bitmap + event_type_jaccard +
#     stream_type_jaccard + rfm_segments (analytics_q) moved from
#     R19_CANDIDATE_* into QUERIES/ORACLE (all four passed the pytest
#     parity harness in r18). Completes the bitmap bit_and
#     intersection algebra whose bit_or fold half shipped r17/r18.
#   * NEW this round (2, verdict item 7): grouped_percentile_approx
#     (Spark's native mergeable percentile_approx sketch agg vs exact
#     DuckDB quantile_disc — exact at test SF by the accuracy choice)
#     and stratified_reservoir (per-stratum deterministic hash-order
#     reservoir via EXACT salted two-phase top-k), both selection_q
#     appends.
#   * DIFF RE-VERIFY (6): bitmap_distinct_users +
#     stream_bitmap_distinct + rolling_7d_users_bitmap (operators/
#     bitmap.py ADVICE r18 #3 'bits' group-column guard — the other
#     bitmap consumers, cohort_retention_bitmap / *_type_jaccard, are
#     in the staged set above); patient_record_linkage +
#     linkage_entities + linkage_incremental (operators/linkage.py
#     ADVICE r18 #1 lazy/opt-out localCheckpoint in blocked_pairs,
#     and linkage_q ADVICE r18 #2 collision-free registry prefix +
#     db-qualified purge in q_linkage_incremental). All other module
#     hunks this round are pure appends (new functions + dict-entry
#     registration only; no existing function hunk touched), so
#     out-of-window greens stand.
#   * R13 DRAIN (26 = the ENTIRE remaining r13 band): after this
#     round no registry green is older than r14.
#   * R14 DRAIN (12): alphabetical head of the 49-row r14 band
#     (agg_minmax .. fhir_ndjson_coverage_bundles).
# ROUND-20 QUEUE: FIRST the THIRTEEN staged registrations — eight in
# analytics_q.R20_CANDIDATE_* (column_profile, value_histogram,
# interarrival_quantiles, cohort_ltv_curve, benford_first_digit,
# funnel_time_to_convert — registering funnel_time_to_convert should
# pull funnel_conversion in-window too if the stage chains are
# unified — daily_value_trend, and survival_km) plus
# stream_stratified_reservoir, bootstrap_ci, stream_bootstrap_ci,
# weighted_percentile, and classifier_auc (selection_q.
# R20_CANDIDATE_*, next to their batch siblings) — then the
# remaining 37 r14 rows
# (fhir_ndjson_export_errors, fhir_ndjson_observations,
# fhir_ndjson_patient_conditions, fhir_ndjson_type_counts,
# fhir_omop_cohort, fhir_omop_condition_era, fhir_omop_device_era,
# fhir_omop_dose_era, fhir_omop_note, fhir_omop_observation,
# fhir_omop_payer_plan_period, fhir_omop_specimen,
# fhir_quality_measure_catalog, fhir_research_enrollment,
# fhir_terminology_catalog, lm_perplexity_filter, minhash_est_error,
# mrl_recall_at_k, multimodal_features, multiway_join_agg,
# paragraph_dedup, pca_top_component, percentile_agg, pq_adc_topk,
# pq_encode, pricing_summary, quality_classifier_filter,
# quantile_sketch_estimate, scd2_intervals, stream_dedup_counts,
# stream_hll_users, stream_merge_upsert, stream_ndjson_counts,
# stream_quantile_sketch, stream_windowed_counts, string_agg_sorted,
# unimax_sample), then the r15 band head behind them — minus however
# many slots r20's new/staged rows and diff re-verifications take,
# per the standing window invariant.
#
# --------------------------------------------------------------------------
_WINDOW = (
    # --- ROUND 19: registered from staging (4) ---
    "cohort_retention_bitmap",
    "event_type_jaccard",
    "stream_type_jaccard",
    "rfm_segments",
    # --- ROUND 19: new queries (2) ---
    "grouped_percentile_approx",
    "stratified_reservoir",
    # --- ROUND 19: diff re-verify (6) ---
    "bitmap_distinct_users",
    "stream_bitmap_distinct",
    "rolling_7d_users_bitmap",
    "patient_record_linkage",
    "linkage_entities",
    "linkage_incremental",
    # --- ROUND 19: r13 drain, the entire remaining band (26) ---
    "countmin_estimate",
    "date_series",
    "domain_quantile_filter",
    "dsir_importance",
    "dup_span_removal",
    "fhir_device_metrics",
    "fhir_insurance_plans",
    "fhir_omop_care_site",
    "fhir_omop_cost",
    "fhir_omop_device_exposure",
    "fhir_omop_drug_era",
    "fhir_omop_location",
    "hll_distinct_estimate",
    "image_dims",
    "ivf_multiprobe_topk",
    "ivf_probe_topk",
    "ivf_recall_at_k",
    "ivfpq_rerank",
    "ivfpq_residual_search",
    "ivfpq_search",
    "join_filter_pushdown",
    "lang_id",
    "merge_upsert",
    "source_drift_chi2",
    "source_quota_sample",
    "weighted_sample_topk",
    # --- ROUND 19: r14 drain, alphabetical head (12) ---
    "agg_minmax",
    "arith_funcs",
    "bm25_inverted_topk",
    "bm25_topk",
    "bpe_train_encode",
    "bpe_train_merges",
    "case_when_literal",
    "computed_key_join",
    "count_distinct",
    "domain_quantile_sketch",
    "fhir_concept_map_translate",
    "fhir_ndjson_coverage_bundles",
)


def _merged(attr: str) -> dict:
    out: dict = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        part = getattr(mod, attr, {})
        overlap = set(out) & set(part)
        if overlap:
            raise ValueError(f"duplicate query names across modules: {overlap}")
        out.update(part)
    missing = [n for n in _WINDOW if n not in out] if attr == "QUERIES" else []
    if missing:
        raise ValueError(f"window names not in registry: {missing}")
    # window names first (driver checks the first 50), then the rest in
    # module order
    ordered = {n: out[n] for n in _WINDOW if n in out}
    ordered.update({n: v for n, v in out.items() if n not in ordered})
    return ordered


def all_queries() -> dict:
    return _merged("QUERIES")


def all_oracles() -> dict:
    return _merged("ORACLE")
