"""Named query registry — merges all query modules.

Each module contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL twin). Names missing from ``ORACLE`` get
the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators; prefixed ``ro_``).
"""

from __future__ import annotations

import importlib

# Merge order = driver check order (dicts preserve insertion order, and the
# driver's correctness window covers a prefix of the registry). Invariant,
# re-checked every round: every query whose code changed this round, plus
# every NEW query, must sit inside the first 50 entries; everything past 50
# must have a green row in a prior CORRECTNESS file AND live in modules
# untouched since that check. Round 3: pipeline (edited: ivf/embedding/
# token/clusters; new star-CC, multi-probe, dedup-representatives),
# temporal, reshape, fhir (6 new synthetic-bundle queries), relational_ext
# (merge.py edited → merge_upsert must stay in-window) fill entries 1-50
# EXACTLY — pipeline(26) + temporal(2) + reshape(4) + fhir(10) +
# relational_ext(8, ending in merge_upsert at #50). ALL of sqlapi /
# relational / functions_battery is out: untouched this round, green r1/r2.
_MODULES = (
    "interop_spark.queries.pipeline",
    "interop_spark.queries.temporal_q",
    "interop_spark.queries.reshape",
    "interop_spark.queries.fhir_queries",
    "interop_spark.queries.relational_ext",
    "interop_spark.queries.sqlapi",
    "interop_spark.queries.relational",
    "interop_spark.queries.functions_battery",
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
    return out


def all_queries() -> dict:
    return _merged("QUERIES")


def all_oracles() -> dict:
    return _merged("ORACLE")
