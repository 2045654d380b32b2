"""Named query registry — merges all query modules.

Each module contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL twin). Names missing from ``ORACLE`` get
the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators; prefixed ``ro_``).
"""

from __future__ import annotations

import importlib

_MODULES = (
    "interop_spark.queries.relational",
    "interop_spark.queries.relational_ext",
    "interop_spark.queries.functions_battery",
    "interop_spark.queries.sqlapi",
    "interop_spark.queries.reshape",
    "interop_spark.queries.pipeline",
    "interop_spark.queries.temporal_q",
    "interop_spark.queries.fhir_queries",
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
