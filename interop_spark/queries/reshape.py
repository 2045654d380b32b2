"""Reshaping / generation queries: unpivot (wide→long), rank battery,
order-deterministic string aggregation, and date-series generation —
rounding out the §2.7 function surface with oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of part's numeric attributes."""
    p = load(spark, sf_dir, "part").where(col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.round(col("p_retailprice"), 2).alias("retailprice"),
        col("p_size").cast("double").alias("size"),
    ).unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="attr",
        valueColumnName="val",
    )


def q_window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / percent_rank / cume_dist / ntile over orders per customer."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").where(col("o_custkey") < 30)
    w = Window.partitionBy("o_custkey").orderBy(
        col("o_totalprice").asc(), col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-deterministic string aggregation: sort the collected list
    before joining (collect_list order is nondeterministic — the sort is
    what makes this oracle-safe)."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy(col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
        F.count(F.lit(1)).alias("n_nations"),
    )


def q_date_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar generation: explode a per-order date sequence (order date →
    +6 days) and count coverage per weekday — sequence+explode as the
    dimension-building primitive."""
    o = load(spark, sf_dir, "orders").where(col("o_orderkey") < 200)
    days = F.sequence(
        col("o_orderdate").cast("date"),
        F.date_add(col("o_orderdate").cast("date"), 6),
    )
    return (
        o.select(F.explode(days).alias("d"))
        .groupBy(F.weekday(col("d")).alias("weekday_mon0"))
        .agg(F.count(F.lit(1)).alias("n_days"))
    )


QUERIES = {
    "unpivot": q_unpivot,
    "window_rank_battery": q_window_rank_battery,
    "string_agg_sorted": q_string_agg_sorted,
    "date_series": q_date_series,
}

ORACLE = {
    "unpivot": """
        SELECT p_partkey, attr, val FROM (
          SELECT p_partkey,
                 round(p_retailprice, 2) AS retailprice,
                 CAST(p_size AS DOUBLE) AS size
          FROM part WHERE p_partkey < 100
        ) UNPIVOT (val FOR attr IN (retailprice, size))
    """,
    "window_rank_battery": """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER w AS INTEGER) AS rnk,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile
        FROM orders WHERE o_custkey < 30
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    "string_agg_sorted": """
        SELECT n_regionkey AS regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
               count(1) AS n_nations
        FROM nation GROUP BY 1
    """,
    "date_series": """
        SELECT CAST(isodow(d) - 1 AS INTEGER) AS weekday_mon0,
               count(1) AS n_days
        FROM (
          SELECT unnest(generate_series(CAST(o_orderdate AS DATE),
                                        CAST(o_orderdate AS DATE)
                                          + INTERVAL 6 DAY,
                                        INTERVAL 1 DAY)) AS d
          FROM orders WHERE o_orderkey < 200
        )
        GROUP BY 1
    """,
}
