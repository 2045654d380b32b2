"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-table star-join aggregate on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) with DuckDB
oracle twins.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from interop_spark.queries.relational import q_multiway_join_agg

    return q_multiway_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from interop_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each ``queries()`` entry (names without a
    twin get the driver's weaker rows-only check)."""
    from interop_spark.queries import all_oracles

    return all_oracles()
