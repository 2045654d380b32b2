"""Named query registry — merges all query modules.

Each module contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL twin). Names missing from ``ORACLE`` get
the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators; prefixed ``ro_``).
"""

from __future__ import annotations

import importlib

# Merge order = driver check order (dicts preserve insertion order, and the
# driver's correctness window covers a prefix of the registry). Round 1
# verified the first 50 entries — exactly the relational/battery modules —
# so round 2 puts the then-unchecked modules (pipeline, temporal, reshape,
# FHIR, plus the reworked sqlapi entry) FIRST; the relational battery that
# falls out of this round's window already has green CORRECTNESS_r01 rows.
_MODULES = (
    "interop_spark.queries.pipeline",
    "interop_spark.queries.temporal_q",
    "interop_spark.queries.reshape",
    "interop_spark.queries.fhir_queries",
    "interop_spark.queries.sqlapi",
    "interop_spark.queries.relational_ext",
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
