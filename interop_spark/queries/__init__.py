"""Named query registry — merges all query modules.

Each module contributes ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLE`` (name → DuckDB SQL twin). Names missing from ``ORACLE`` get
the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators).
"""

from __future__ import annotations

from interop_spark.queries import relational


def all_queries() -> dict:
    merged = {}
    merged.update(relational.QUERIES)
    try:
        from interop_spark.queries import pipeline

        merged.update(pipeline.QUERIES)
    except ImportError:
        pass
    try:
        from interop_spark.queries import fhir_queries

        merged.update(fhir_queries.QUERIES)
    except ImportError:
        pass
    return merged


def all_oracles() -> dict:
    merged = {}
    merged.update(relational.ORACLE)
    try:
        from interop_spark.queries import pipeline

        merged.update(pipeline.ORACLE)
    except ImportError:
        pass
    try:
        from interop_spark.queries import fhir_queries

        merged.update(fhir_queries.ORACLE)
    except ImportError:
        pass
    return merged
