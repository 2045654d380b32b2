"""Extended relational coverage: multi-level aggregation (ROLLUP/CUBE/
GROUPING SETS), argmax aggregates, pivot, array-function battery, and the
upsert/merge pattern (the J3 staging-dedupe flow completed into an actual
merge). Each query has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): subtotals + grand total; NULL group
    keys coalesced so both engines hash identically."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.coalesce(col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "cnt",
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status),(priority)) via SQL."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(1) AS cnt
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


def q_argmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax/argmin via max/min over a (value, tiebreak-key)
    struct — the portable form of max_by/min_by."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(col("o_custkey").alias("custkey"))
        .agg(
            F.max(
                F.struct(col("o_totalprice").alias("v"), col("o_orderkey").alias("k"))
            )["k"].alias("biggest_order"),
            F.min(
                F.struct(col("o_orderdate").alias("v"), col("o_orderkey").alias("k"))
            )["k"].alias("first_order"),
        )
    )


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot returnflag into columns (explicit value list → stable schema)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(col("l_linestatus").alias("linestatus"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over a deterministically built array."""
    p = load(spark, sf_dir, "part").where(col("p_partkey") < 120)
    # bigint elements: DuckDB generate_series yields BIGINT[], so the Spark
    # side matches the element type for schema-level parity
    arr = F.sequence(
        F.lit(1).cast("bigint"), ((col("p_size") % 5) + 2).cast("bigint")
    )
    def as_str(c):
        # array-typed outputs leave as joined strings: pandas renders Spark
        # lists and DuckDB numpy arrays differently, breaking value hashes
        return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")

    return p.select(
        "p_partkey",
        as_str(arr).alias("seq_arr"),
        F.size(arr).alias("arr_len"),
        F.array_contains(arr, 3).alias("has_three"),
        F.array_position(arr, 2).alias("pos_of_two"),
        F.array_max(arr).alias("arr_max"),
        as_str(F.slice(arr, 1, 2)).alias("first_two"),
        as_str(F.concat(arr, F.array(F.lit(99).cast("bigint")))).alias(
            "appended"
        ),
        F.array_join(F.transform(arr, lambda x: x.cast("string")), "-").alias(
            "joined"
        ),
        F.exists(arr, lambda x: x > 4).alias("any_gt4"),
        F.forall(arr, lambda x: x > 0).alias("all_pos"),
        F.aggregate(arr, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "arr_sum"
        ),
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staging-merge the reference's J3 flags feed (insert-new +
    update-existing): Delta MERGE semantics (UPDATE SET * / INSERT *) via
    the relational ``merge_into`` operator — staging overrides target by
    key, target rows without a staging match pass through.
    ``source_unique=True`` because the staging keys are unique by
    construction (skips the duplicate-match check's window shuffle; the
    checked path is covered by ``test_operators.py``)."""
    from interop_spark.operators.merge import merge_into

    target = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(col("o_totalprice"), 2).alias("price"),
        F.lit("target").alias("src"),
    )
    staging = (
        load(spark, sf_dir, "orders")
        .where(col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            F.round(col("o_totalprice") + 1000.0, 2).alias("price"),
            F.lit("staging").alias("src"),
        )
    )
    merged = merge_into(target, staging, ["o_orderkey"], source_unique=True)
    return merged.select(
        col("o_orderkey").alias("orderkey"), "price", "src"
    )


def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-salted join, driver-verified against the plain join's
    results: salting must be a pure physical rewrite (spread a hot key
    over `salt` reducers) with zero semantic effect — the oracle is the
    unsalted join."""
    from interop_spark.operators.scale import salted_join

    orders = load(spark, sf_dir, "orders")
    customer = (
        load(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
        .select("o_custkey", "c_mktsegment")
    )
    return (
        salted_join(orders, customer, "o_custkey", salt=8)
        .groupBy(col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


QUERIES = {
    "rollup_agg": q_rollup_agg,
    "salted_join_agg": q_salted_join_agg,
    "cube_agg": q_cube_agg,
    "grouping_sets": q_grouping_sets,
    "argmax_agg": q_argmax_agg,
    "pivot_agg": q_pivot_agg,
    "array_funcs": q_array_funcs,
    "merge_upsert": q_merge_upsert,
}

ORACLE = {
    "salted_join_agg": """
        SELECT c_mktsegment AS mktsegment, count(1) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "rollup_agg": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(1) AS cnt, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "cube_agg": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(1) AS cnt
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "grouping_sets": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(1) AS cnt
        FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    "argmax_agg": """
        SELECT o_custkey AS custkey,
               (max({'v': o_totalprice, 'k': o_orderkey})).k AS biggest_order,
               (min({'v': o_orderdate, 'k': o_orderkey})).k AS first_order
        FROM orders GROUP BY 1
    """,
    "pivot_agg": """
        SELECT l_linestatus AS linestatus,
               round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2) AS "A",
               round(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 2) AS "N",
               round(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 2) AS "R"
        FROM lineitem GROUP BY 1
    """,
    "array_funcs": """
        WITH t AS (
          SELECT p_partkey, generate_series(1, (p_size % 5) + 2) AS arr
          FROM part WHERE p_partkey < 120
        )
        SELECT p_partkey,
               array_to_string(arr, ',') AS seq_arr,
               CAST(len(arr) AS INTEGER) AS arr_len,
               list_contains(arr, 3) AS has_three,
               CAST(list_position(arr, 2) AS BIGINT) AS pos_of_two,
               list_max(arr) AS arr_max,
               array_to_string(arr[1:2], ',') AS first_two,
               array_to_string(list_concat(arr, [99]), ',') AS appended,
               array_to_string(arr, '-') AS joined,
               len(list_filter(arr, x -> x > 4)) > 0 AS any_gt4,
               len(list_filter(arr, x -> x <= 0)) = 0 AS all_pos,
               CAST(list_sum(arr) AS BIGINT) AS arr_sum
        FROM t
    """,
    "merge_upsert": """
        WITH staging AS (
          SELECT o_orderkey, round(o_totalprice + 1000.0, 2) AS price,
                 'staging' AS src
          FROM orders WHERE o_orderkey % 3 = 0
        )
        SELECT o_orderkey AS orderkey, price, src FROM staging
        UNION ALL
        SELECT o_orderkey, round(o_totalprice, 2), 'target' FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM staging s
                          WHERE s.o_orderkey = orders.o_orderkey)
    """,
}
