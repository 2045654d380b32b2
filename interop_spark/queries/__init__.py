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
# ROUND-18 window (50): executes the r17 verdict's queue exactly.
#   * REGISTERED FROM STAGING (7, the whole staged set per verdict
#     item 1): linkage_entities (linkage_q), twap_per_user +
#     ab_test_zstat + triangle_count + zorder_layout +
#     rolling_7d_users_bitmap + top_paths (analytics_q) moved from
#     R18_CANDIDATE_* into QUERIES/ORACLE (all seven passed the pytest
#     parity harness in r17).
#   * NEW this round (2): linkage_incremental (verdict item 5 — batch
#     vs PERSISTED bucketed crosswalk, operators/linkage.py
#     incremental_pairs + linkage_q append) and scd2_history (verdict
#     item 6 — multi-attribute SCD2 dimension build over orders,
#     analytics_q append; the single-attribute event build is the
#     r13-green scd2_intervals).
#   * DIFF RE-VERIFY (3): patient_record_linkage (blocked_pairs now
#     localCheckpoints the guarded frame — verdict item 4);
#     bitmap_distinct_users + stream_bitmap_distinct (operators/
#     bitmap.py ADVICE r17 fixes: signed-id shiftright/pmod mapping,
#     popcount coalesce-to-0, word-column collision guard + rename —
#     rolling_7d_users_bitmap consumes the same module but is already
#     in the staged set above). All other modules' hunks this round
#     are pure appends (new functions + new dict entries only; no
#     existing function hunk touched), so out-of-window greens stand.
#   * R12 DRAIN (30 = the ENTIRE remaining r12 band): the two
#     displaced heads first (fhir_nutrition_orders,
#     fhir_omop_condition_occurrence — the displaced-head rule), then
#     the 28-row residue. After this round no registry green is older
#     than r13.
#   * R13 DRAIN (8): alphabetical head of the 34-row r13 band
#     (agg_stats .. classifier_train_steps).
# ROUND-19 QUEUE: the remaining 26 r13 rows (countmin_estimate,
# date_series, domain_quantile_filter, dsir_importance,
# dup_span_removal, fhir_device_metrics, fhir_insurance_plans,
# fhir_omop_care_site, fhir_omop_cost, fhir_omop_device_exposure,
# fhir_omop_drug_era, fhir_omop_location, hll_distinct_estimate,
# image_dims, ivf_multiprobe_topk, ivf_probe_topk, ivf_recall_at_k,
# ivfpq_rerank, ivfpq_residual_search, ivfpq_search,
# join_filter_pushdown, lang_id, merge_upsert, source_drift_chi2,
# source_quota_sample, weighted_sample_topk), then the r14 band head
# behind them — minus however many slots r19's new/staged rows and
# diff re-verifications take, per the standing window invariant.
#
# --------------------------------------------------------------------------
_WINDOW = (
    # --- ROUND 18: registered from staging (7) ---
    "linkage_entities",
    "twap_per_user",
    "ab_test_zstat",
    "triangle_count",
    "zorder_layout",
    "rolling_7d_users_bitmap",
    "top_paths",
    # --- ROUND 18: new queries (2) ---
    "linkage_incremental",
    "scd2_history",
    # --- ROUND 18: diff re-verify (3) ---
    "patient_record_linkage",
    "bitmap_distinct_users",
    "stream_bitmap_distinct",
    # --- ROUND 18: r12 drain, displaced heads first (2) ---
    "fhir_nutrition_orders",
    "fhir_omop_condition_occurrence",
    # --- ROUND 18: r12 residue (28) ---
    "fhir_omop_death",
    "fhir_omop_drug_exposure",
    "fhir_omop_measurement",
    "fhir_omop_observation_period",
    "fhir_omop_person",
    "fhir_omop_procedure_occurrence",
    "fhir_omop_provider",
    "fhir_omop_visit_occurrence",
    "fhir_patient_claims",
    "fhir_patient_conditions",
    "fhir_patient_observations",
    "fhir_providers_practitioners",
    "fhir_questionnaire_answers",
    "fhir_questionnaire_join",
    "fhir_reference_integrity",
    "fhir_slots",
    "grouping_sets",
    "knn_batch",
    "knn_cosine",
    "minhash_incremental_dedup",
    "ngram_decontaminate",
    "pivot_agg",
    "semdedup_keep",
    "stream_join_pairs_watermarked",
    "stream_neardup_pairs",
    "text_quality",
    "train_test_split",
    "winnow_dup_pairs",
    # --- ROUND 18: r13 drain, alphabetical head (8) ---
    "agg_stats",
    "audio_stats",
    "bpe_encode",
    "bpe_merge_candidates",
    "bsq_hamming_search",
    "c4_clean",
    "chunk_sliding",
    "classifier_train_steps",
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
