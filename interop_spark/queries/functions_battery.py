"""Scalar/aggregate/window function batteries (SURVEY.md §2.7 and engine
extensions) — broad coverage of the function surface a reference user
relies on, each with a DuckDB oracle twin. These are deliberately cheap
single-scan queries: their value is breadth, not plan complexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: concat/lpad/upper/replace/regexp_extract/
    instr/reverse/substr (P10/P12 generalized)."""
    return (
        load(spark, sf_dir, "customer")
        .where(col("c_custkey") < 100)
        .select(
            "c_custkey",
            F.concat(col("c_name"), F.lit("::"), col("c_mktsegment")).alias(
                "concat_col"
            ),
            F.lpad(col("c_mktsegment"), 12, "_").alias("lpad_col"),
            F.upper(col("c_name")).alias("upper_col"),
            F.lower(col("c_mktsegment")).alias("lower_col"),
            F.replace(col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
                "replace_col"
            ),
            F.regexp_extract(col("c_name"), r"#0*([0-9]+)", 1).alias("num_part"),
            F.instr(col("c_name"), "#").alias("hash_pos"),
            F.length(col("c_name")).alias("name_len"),
            F.reverse(col("c_mktsegment")).alias("rev_col"),
            F.substring(col("c_name"), 1, 8).alias("prefix8"),
        )
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery: trunc/last_day/weekday/weekofyear/quarter/
    date_add/datediff (P11 generalized)."""
    return (
        load(spark, sf_dir, "orders")
        .where(col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.date_trunc("month", col("o_orderdate")).alias("month_start"),
            # date-typed outputs go out as formatted strings: pandas/Arrow
            # render date vs timestamp differently across engines
            F.date_format(F.last_day(col("o_orderdate")), "yyyy-MM-dd").alias(
                "month_end"
            ),
            F.weekday(col("o_orderdate")).alias("weekday_mon0"),
            F.weekofyear(col("o_orderdate")).alias("week_of_year"),
            F.quarter(col("o_orderdate")).alias("qtr"),
            F.date_format(F.date_add(col("o_orderdate"), 30), "yyyy-MM-dd").alias(
                "plus30"
            ),
            F.datediff(
                col("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("days_since_epoch_start"),
        )
    )


def q_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/math battery: abs/ceil/floor/mod/sign/sqrt/ln/power."""
    return (
        load(spark, sf_dir, "lineitem")
        .where(col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(col("l_extendedprice") - 50000).alias("abs_delta"),
            F.ceil(col("l_quantity")).alias("qty_ceil"),
            F.floor(col("l_extendedprice") / 1000).alias("price_k_floor"),
            (col("l_partkey") % 7).alias("part_mod7"),
            F.signum(col("l_discount") - 0.05).alias("disc_sign"),
            F.round(F.sqrt(col("l_extendedprice")), 4).alias("price_sqrt"),
            F.round(F.log(col("l_extendedprice")), 4).alias("price_ln"),
            F.round(F.pow(col("l_tax") + 1, 2), 4).alias("tax_sq"),
        )
    )


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar/median."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(col("l_returnflag").alias("returnflag"))
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias(
                "disc_tax_covar"
            ),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "price_median"
            ),
        )
    )


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event windows (batch twin of the streaming
    windowed_event_counts; bucket emitted as epoch seconds for engine-
    neutral comparison)."""
    ev = load(spark, sf_dir, "events")
    bucket = (F.floor(col("ts").cast("long") / 3600) * 3600).cast("bigint")
    return ev.groupBy(
        bucket.alias("window_epoch"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag/dense_rank window battery over the event stream."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").where(col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(col("ts").asc(), col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.dense_rank().over(
            Window.partitionBy("user_id").orderBy(col("event_type").asc())
        ).alias("type_rank"),
    )


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER/CASE-driven conditional aggregation (pivot-style counts)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.when(col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
            F.round(
                F.sum(
                    F.when(col("event_type") == "purchase", col("value")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("purchase_value"),
        )
    )


QUERIES = {
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "arith_funcs": q_arith_funcs,
    "agg_stats": q_agg_stats,
    "tumbling_window": q_tumbling_window,
    "lead_lag": q_lead_lag,
    "conditional_agg": q_conditional_agg,
}

ORACLE = {
    "string_funcs": """
        SELECT c_custkey,
               concat(c_name, '::', c_mktsegment) AS concat_col,
               lpad(c_mktsegment, 12, '_') AS lpad_col,
               upper(c_name) AS upper_col,
               lower(c_mktsegment) AS lower_col,
               replace(c_name, 'Customer', 'Cust') AS replace_col,
               regexp_extract(c_name, '#0*([0-9]+)', 1) AS num_part,
               CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
               CAST(length(c_name) AS INTEGER) AS name_len,
               reverse(c_mktsegment) AS rev_col,
               substring(c_name, 1, 8) AS prefix8
        FROM customer WHERE c_custkey < 100
    """,
    "date_funcs": """
        SELECT o_orderkey,
               date_trunc('month', o_orderdate) AS month_start,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
                 AS month_end,
               CAST(isodow(o_orderdate) - 1 AS INTEGER) AS weekday_mon0,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS week_of_year,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d')
                 AS plus30,
               CAST(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS INTEGER)
                 AS days_since_epoch_start
        FROM orders WHERE o_orderkey < 300
    """,
    "arith_funcs": """
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 50000) AS abs_delta,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
               l_partkey % 7 AS part_mod7,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
               round(sqrt(l_extendedprice), 4) AS price_sqrt,
               round(ln(l_extendedprice), 4) AS price_ln,
               round(pow(l_tax + 1, 2), 4) AS tax_sq
        FROM lineitem WHERE l_orderkey < 100
    """,
    "agg_stats": """
        SELECT l_returnflag AS returnflag,
               round(stddev_samp(l_extendedprice), 4) AS price_stddev,
               round(var_samp(l_quantity), 4) AS qty_var,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_discount, l_tax), 8) AS disc_tax_covar,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS price_median
        FROM lineitem GROUP BY 1
    """,
    "tumbling_window": """
        SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_epoch,
               event_type,
               count(1) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "lead_lag": """
        SELECT user_id, event_id,
               lag(event_type, 1) OVER w AS prev_type,
               lead(event_type, 1) OVER w AS next_type,
               CAST(dense_rank() OVER (PARTITION BY user_id
                                       ORDER BY event_type ASC) AS INTEGER)
                 AS type_rank
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    "conditional_agg": """
        SELECT user_id,
               count(1) FILTER (WHERE event_type = 'click') AS clicks,
               count(1) FILTER (WHERE event_type = 'purchase') AS purchases,
               round(sum(CASE WHEN event_type = 'purchase' THEN value
                              ELSE 0.0 END), 2) AS purchase_value
        FROM events GROUP BY user_id
    """,
}
