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
# ROUND-15 window (50): drains the ENTIRE 37-row r9-stale queue (r14
# verdict item 1 — after this round no registry green is older than
# r10), then this round's NEW rows, the diff re-verify, and an 8-row
# r10-residue drain head.
#   * R9 QUEUE DRAIN (37, exactly the r14 ledger's queue): the four
#     twice-displaced heads dup_ngram_stats, decontam_ngram_overlap,
#     date_parts, date_funcs FIRST (the r14 verdict: do not displace
#     them again), then alphabetical from exact_dedup through
#     video_meta. Two of these — simhash + simhash_neardup_pairs —
#     double as diff re-verifies: the banded-join body moved to the
#     new shared ``operators/dedup.py:simhash_candidate_pairs`` (with
#     the hot-band ``max_band_docs`` guard, r14 verdict item 3; the
#     driver row passes None → exact candidate semantics, oracle
#     unchanged). The dedup.py change is one inserted function — no
#     existing function's hunks touched, so other dedup consumers
#     keep their greens; pipeline.py's only changed hunk is
#     q_simhash_neardup_pairs's body.
#   * NEW this round (4): domain_reweight_converge (the DoReMi k=4
#     iteration composed from the r14 single step — integer
#     tilt→renormalize→ε-smooth per round, localCheckpoint between
#     rounds, unrolled-CTE oracle; r14 verdict item 4),
#     fhir_omop_visit_detail (Encounter.location ward transfers →
#     CDM visit_detail via a location.period SCHEMA OVERRIDE read —
#     S4 exercised on a real row; r14 verdict item 7),
#     fhir_request_group_actions (TWELFTH promotion batch proof row —
#     execution pair ActivityDefinition/RequestGroup, 87 curated / 57
#     spine; canonical-with-version split + broadcast resolve; r14
#     verdict item 5), fhir_writer_canonical_leaves (writer
#     canonical/uri passthrough-vs-urn-normalization contrast row —
#     the typed-leaf residue, r14 verdict item 6; no writer.py code
#     change, so fhir_writer_roundtrip keeps its r11 green). The
#     three FHIR rows read the NEW r15 EXTENSION corpus
#     (gen.py:EXT_NDJSON_VERSION, own directory) — the main
#     bundle (v16) and NDJSON (v10) corpora are UNTOUCHED this
#     round, so their consumer fleets keep their greens and the
#     37-row drain fits the window.
#   * DIFF RE-VERIFY (1): domain_reweight_step (its scored-frame
#     build moved to the shared ``_reweight_scored`` helper the
#     converge row reuses — same plan, but the body changed, so it
#     re-verifies; selection_q.py's other hunks are pure appends).
#     The twelfth promotion batch only ADDS catalog entries
#     (ActivityDefinition/RequestGroup were spine-only; no curated
#     schema changed — catalog JSON diff is additions + the two
#     spine-file removals), so no other FHIR row re-verifies.
#   * NEW ROUND-15b (8, displacing the planned 8-row r10-residue
#     drain — new/diff-affected rows outrank drain schedule for the
#     50 slots; the drain rows return to the r16 queue HEAD):
#     theta_sketch_setops / heavy_hitter_tokens / cooccurrence_topk /
#     int4_roundtrip (NEW MODULE queries/corpus_ext.py + NEW operator
#     modules operators/theta.py, operators/quantize.py — no existing
#     query module's code changed, so no out-of-window row is
#     diff-affected by them), fhir_omop_episode (two-level
#     gap-and-island over the UNCHANGED main NDJSON corpus; pure
#     appends to fhir/analytics.py + queries/fhir_queries.py),
#     fhir_omop_fact_relationship + fhir_medication_knowledge_costs +
#     fhir_contract_terms (THIRTEENTH promotion batch
#     MedicationKnowledge/Contract, ext corpus v1->v2 — its three v1
#     consumers fhir_omop_visit_detail / fhir_request_group_actions /
#     fhir_writer_canonical_leaves are already in-window above; the
#     curated Specimen gains the R4 `parent` field, a monotone ADD
#     absent from the main corpora, so existing Specimen consumers
#     parse identically; batch-13 catalog diff is otherwise additions
#     + two spine-file removals).
# ROUND-16 QUEUE: first the 8 r10 rows displaced from this window
# (approx_count_distinct, approx_quantile, argmax_agg,
# boilerplate_lines, bundle_collect_flatten, corpus_clean — also the
# bench drift-watch item, see BENCH_DETAIL drift note —
# correlated_exists, cross_join_sql), then the remaining 23 r10 rows
# alphabetical from dedup_representatives (dedup_representatives,
# domain_mix_sample, encoding_quality, groupby_ordinal_sql,
# in_subquery, json_extract, latest_event_per_user, lead_lag,
# minhash_lsh_neardup, neardup_clusters, neardup_clusters_star,
# pretrain_pipeline, rollup_agg, running_total, scalar_subquery,
# script_profile, select_star_expansion, sessionize, sq8_roundtrip,
# text_token_stats, token_entropy, tumbling_window, union_all_sql),
# then the r11 residue behind them.
# --------------------------------------------------------------------------
_WINDOW = (
    # --- ROUND 15: the 37-row r9 queue drain (heads first) ---
    "dup_ngram_stats",
    "decontam_ngram_overlap",
    "date_parts",
    "date_funcs",
    "exact_dedup",
    "explode_roundtrip",
    "gopher_quality_flags",
    "gopher_repetition_signals",
    "groupby_count",
    "having_filter",
    "hof_filter_array",
    "hybrid_rrf_topk",
    "inner_equi_join",
    "ivf_index_search",
    "ivfpq_rerank_sweep",
    "kmeans_fit",
    "kmeans_one_step",
    "left_anti_join",
    "left_outer_exists_flag",
    "left_semi_join",
    "like_filter_or",
    "nested_struct_pluck",
    "pii_redact",
    "resample_ffill",
    "salted_join_agg",
    "scan_project_filter",
    "sequence_pack",
    "set_except",
    "set_intersect",
    "set_union",
    "simhash",
    "simhash_neardup_pairs",
    "stream_sessionize_counts",
    "string_funcs",
    "substring_key",
    "topk_orders",
    "video_meta",
    # --- ROUND 15: new queries (4) ---
    "domain_reweight_converge",
    "fhir_omop_visit_detail",
    "fhir_request_group_actions",
    "fhir_writer_canonical_leaves",
    # --- ROUND 15: diff re-verify (1) ---
    "domain_reweight_step",
    # --- ROUND 15b: new queries (8; displaced the 8-row r10-residue
    # drain head back to the r16 queue — new rows MUST sit in-window,
    # the drain is schedule, not debt) ---
    "theta_sketch_setops",
    "heavy_hitter_tokens",
    "cooccurrence_topk",
    "int4_roundtrip",
    "fhir_omop_episode",
    "fhir_omop_fact_relationship",
    "fhir_medication_knowledge_costs",
    "fhir_contract_terms",
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
