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
)

# --------------------------------------------------------------------------
# Driver check-window rotation (the driver's correctness gate covers the
# FIRST 50 registry entries; dicts preserve insertion order).
#
# Invariant, re-stated and applied every round: every query that is NEW
# this round, plus every query whose RESULT could be affected by this
# round's diffs — judged module-granularly over the query's transitive
# imports, with any finer-than-module claim justified per-diff below —
# sits inside the first 50; everything past 50 has a green row in a prior
# CORRECTNESS file AND its code is unchanged since that check. Belt and
# suspenders: `tests/driver_sim.py` runs ALL queries against their
# oracles locally each round (round 4: ALL MATCH at sf0.01; see
# STATUS.md).
#
# Round-4 window (50):
#   * fhir_queries, all 12 — fhir/schema.py (data-file catalog),
#     fhir/gen.py (Observation resource), fhir/analytics.py and
#     fhir/writer.py changed; 2 queries are NEW
#     (fhir_patient_observations, fhir_condition_text).
#   * pipeline_ext, all 3 — NEW (gopher_quality_flags, ivf_index_search,
#     kmeans_one_step).
#   * ivf_probe_topk, ivf_multiprobe_topk — operators/similarity.py
#     changed: nearest_centroid's argmax accumulator is now
#     NULL-initialized. Finer-than-module claim for the OTHER
#     similarity-importing queries (knn_cosine, knn_batch,
#     lsh_bucket_sizes, embedding_neardup, embedding_centroids): the
#     round-4 similarity.py diff touches only nearest_centroid, which
#     none of them call (they use cosine/lsh/brute-force kernels), and
#     operators/text.py's diff touches only gopher_quality_flags, which
#     no round-3 query calls — all five (and the rest of pipeline)
#     retain their r3 green under unchanged code paths.
#   * relational, all 28 + functions_battery 5 (string_funcs, date_funcs,
#     arith_funcs, agg_stats, tumbling_window) — STALENESS ROTATION:
#     these were last driver-checked in round 1; their modules are
#     untouched, this re-verifies 33 of the 44 r1/r2-era rows.
#
# Out-of-window residue after round 4: sqlapi (9, r2-green) + lead_lag /
# conditional_agg (r1-green) + the r3-green pipeline/temporal/reshape/
# relational_ext rows. ROUND-5 ROTATION PLAN: put sqlapi + lead_lag +
# conditional_agg in the window first — that retires every pre-r3 row.
# --------------------------------------------------------------------------
_WINDOW = (
    # fhir (12)
    "bundle_collect_flatten",
    "fhir_adt_timeline",
    "fhir_writer_roundtrip",
    "multimodal_features",
    "fhir_patient_conditions",
    "fhir_patient_claims",
    "fhir_medication_requests",
    "fhir_providers_practitioners",
    "fhir_omop_person",
    "fhir_ingest_corpus",
    "fhir_patient_observations",
    "fhir_condition_text",
    # pipeline_ext (3, new)
    "gopher_quality_flags",
    "ivf_index_search",
    "kmeans_one_step",
    # similarity.py-affected (2)
    "ivf_probe_topk",
    "ivf_multiprobe_topk",
    # staleness rotation: relational (28, r1-era)
    "scan_project_filter",
    "like_filter_or",
    "substring_key",
    "date_parts",
    "case_when_literal",
    "json_extract",
    "inner_equi_join",
    "computed_key_join",
    "join_filter_pushdown",
    "left_outer_exists_flag",
    "left_semi_join",
    "left_anti_join",
    "multiway_join_agg",
    "groupby_count",
    "pricing_summary",
    "count_distinct",
    "agg_minmax",
    "having_filter",
    "topk_orders",
    "set_union",
    "set_intersect",
    "set_except",
    "explode_roundtrip",
    "hof_filter_array",
    "nested_struct_pluck",
    "latest_event_per_user",
    "running_total",
    "sessionize",
    # staleness rotation: functions_battery (5, r1-era)
    "string_funcs",
    "date_funcs",
    "arith_funcs",
    "agg_stats",
    "tumbling_window",
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
