"""SQL-string entry point queries (SURVEY.md §3 EP2): the reference drives
most analytics through ``%sql`` / ``spark.sql(...)``; these queries
exercise the same parser path — temp-view registration + SQL text —
including GROUP BY ordinal (A1), IN/EXISTS subqueries, scalar subqueries,
and UNION ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from interop_spark.io import load


def _view(spark: SparkSession, sf_dir: str, name: str, alias: str | None = None) -> str:
    vname = f"v_{alias or name}"
    load(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


def q_groupby_ordinal_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 verbatim shape: `select <col>, count(1) ... group by 1`
    (`01_dbignite_sample.py:341-346`)."""
    v = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus AS status_cd, count(1) AS cnt
        FROM {v} GROUP BY 1
        """
    )


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — orders from customers in the BUILDING segment."""
    vo = _view(spark, sf_dir, "orders")
    vc = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey
        FROM {vo}
        WHERE o_custkey IN (SELECT c_custkey FROM {vc}
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey < 400
        """
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — orders above the global average."""
    vo = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM {vo}
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM {vo})
        """
    )


def q_union_all_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a source tag (multiset semantics, no dedupe)."""
    vc = _view(spark, sf_dir, "customer")
    vs = _view(spark, sf_dir, "supplier")
    return spark.sql(
        f"""
        SELECT 'customer' AS side, c_nationkey AS nationkey FROM {vc}
        UNION ALL
        SELECT 'supplier' AS side, s_nationkey AS nationkey FROM {vs}
        """
    )


def q_cross_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN over two small dims."""
    vr = _view(spark, sf_dir, "region")
    vn = _view(spark, sf_dir, "nation")
    return spark.sql(
        f"""
        SELECT r_name, n_name FROM {vr} CROSS JOIN {vn}
        """
    )


def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate (decorrelated by Catalyst
    into a semi join)."""
    vc = _view(spark, sf_dir, "customer")
    vo = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c_custkey FROM {vc} c
        WHERE EXISTS (SELECT 1 FROM {vo} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000.0)
        """
    )


def q_select_star_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: `c.*` beside explicit columns (`01_dbignite_sample.py:325`)."""
    vn = _view(spark, sf_dir, "nation")
    vr = _view(spark, sf_dir, "region")
    return spark.sql(
        f"""
        SELECT n.*, r_name AS region_name
        FROM {vn} n JOIN {vr} ON n_regionkey = r_regionkey
        """
    )


def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct estimation (engine-plan extra, SURVEY §2.4).
    The sketch value is engine-specific, so the driver-checkable contract
    is a tolerance bound: emit the exact count plus a boolean asserting the
    HLL estimate landed within 3× its configured relative standard
    deviation (rsd=0.05 → ±15%); the oracle asserts the same bound
    trivially true. A broken sketch (or a wrong exact count) flips the
    hash."""
    from pyspark.sql import functions as F

    rel_err = (
        F.abs(
            F.approx_count_distinct("l_partkey", rsd=0.05)
            - F.countDistinct("l_partkey")
        )
        / F.countDistinct("l_partkey")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            (rel_err <= 0.15).alias("approx_within_tol"),
        )
    )


def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantile (engine-plan extra, same contract as
    approx_count_distinct): emit the exact interpolated median plus a
    boolean asserting percentile_approx landed within 5% of it; the
    oracle asserts the bound trivially true. Both engines compute the
    exact side with the same linear-interpolation definition."""
    from pyspark.sql import functions as F

    exact = F.percentile("l_quantity", F.lit(0.5))
    approx = F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000))
    rel_err = F.abs(approx - exact) / F.greatest(exact, F.lit(1.0))
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.round(exact, 1).alias("exact_median"),
            (rel_err <= 0.05).alias("approx_within_tol"),
        )
    )


QUERIES = {
    "groupby_ordinal_sql": q_groupby_ordinal_sql,
    "approx_quantile": q_approx_quantile,
    "select_star_expansion": q_select_star_expansion,
    "approx_count_distinct": q_approx_count_distinct,
    "in_subquery": q_in_subquery,
    "scalar_subquery": q_scalar_subquery,
    "union_all_sql": q_union_all_sql,
    "cross_join_sql": q_cross_join_sql,
    "correlated_exists": q_correlated_exists,
}

ORACLE = {
    "approx_quantile": """
        SELECT l_returnflag AS returnflag,
               round(quantile_cont(l_quantity, 0.5), 1) AS exact_median,
               TRUE AS approx_within_tol
        FROM lineitem GROUP BY 1
    """,
    "approx_count_distinct": """
        SELECT l_returnflag AS returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               TRUE AS approx_within_tol
        FROM lineitem GROUP BY 1
    """,
    "select_star_expansion": """
        SELECT n.*, r_name AS region_name
        FROM nation n JOIN region ON n_regionkey = r_regionkey
    """,
    "groupby_ordinal_sql": """
        SELECT o_orderstatus AS status_cd, count(1) AS cnt
        FROM orders GROUP BY 1
    """,
    "in_subquery": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey < 400
    """,
    "scalar_subquery": """
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
    """,
    "union_all_sql": """
        SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    """,
    "cross_join_sql": """
        SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    "correlated_exists": """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000.0)
    """,
}
