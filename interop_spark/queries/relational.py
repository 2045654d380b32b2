"""Relational operator library — SURVEY.md §2 generic operators as named
queries over the driver's TPC-H-ish fixture tables, each with a DuckDB
oracle-SQL twin.

Every query function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the oracle SQL's aliases exactly (the driver sorts columns
by name before value-hashing). Floating aggregates are rounded identically on
both sides so double summation-order differences between engines cannot leak
into the hash.

Reference citations (what each operator re-expresses) point into
``/root/reference/01_dbignite_sample.py``.

Scale posture: every query is pure DataFrame/SQL — no Python UDFs, no
collect-driven loops. Filters and projections reach the parquet scan
(PushedFilters / nested-schema pruning); small dimension tables are
broadcast explicitly; AQE handles skew and post-shuffle coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from interop_spark.io import load

# --------------------------------------------------------------------------
# Scans / projections / filters (S*, P*)
# --------------------------------------------------------------------------


def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+P4: column-pruned scan with pushed-down predicate.

    Re-expresses the reference's flattening projections with filters
    (01_dbignite_sample.py:47-56). The filter and the 3-column projection
    must reach the parquet scan (PushedFilters / ReadSchema).
    """
    return (
        load(spark, sf_dir, "orders")
        .where(col("o_totalprice") > 300000.0)
        .select(
            col("o_orderkey"),
            col("o_orderstatus"),
            F.round(col("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_like_filter_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: LIKE-prefix filter with OR (01_dbignite_sample.py:56,94,160)."""
    c = load(spark, sf_dir, "customer")
    return c.where(
        col("c_name").like("Customer#00000001%")
        | col("c_name").like("Customer#00000002%")
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_substring_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: substring-derived key, as in extracting the provider UUID from a
    reference URL via substring(claim.provider, 82, 36)
    (01_dbignite_sample.py:329)."""
    return (
        load(spark, sf_dir, "customer")
        .select(
            col("c_custkey"),
            F.substring(col("c_name"), 10, 9).alias("cust_num"),
        )
        .where(col("c_custkey") < 50)
    )


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: year/month/dayofmonth extraction, as in the OMOP_PERSON CTAS
    (01_dbignite_sample.py:476-478)."""
    return (
        load(spark, sf_dir, "orders")
        .where(col("o_orderkey") < 100)
        .select(
            col("o_orderkey"),
            F.year(col("o_orderdate")).alias("year_of_order"),
            F.month(col("o_orderdate")).alias("month_of_order"),
            F.dayofmonth(col("o_orderdate")).alias("day_of_order"),
        )
    )


def q_case_when_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9+P12: CASE WHEN / NULL test + string-literal column
    (01_dbignite_sample.py:375,393,512)."""
    return (
        load(spark, sf_dir, "orders")
        .where(col("o_orderkey") < 200)
        .select(
            col("o_orderkey"),
            F.when(col("o_orderstatus") == "F", "finished")
            .when(col("o_orderstatus") == "O", "open")
            .otherwise("pending")
            .alias("status_desc"),
            F.lit("http://www.cms.gov/medicare").alias("code_system"),
        )
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: JSON field extraction staying engine-side (to_json/from_json
    instead of driver-side json.loads, 01_dbignite_sample.py:547-548)."""
    return (
        load(spark, sf_dir, "events")
        .where(col("event_id") < 100)
        .select(
            col("event_id"),
            F.get_json_object(col("props"), "$.k").cast("bigint").alias("k_value"),
        )
    )


# --------------------------------------------------------------------------
# Joins (J*)
# --------------------------------------------------------------------------


def q_inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4: inner equi-join, the bundleUUID-recombination pattern
    (01_dbignite_sample.py:241-243) / SynPUF join (:513-515).

    customer is the small side → explicit broadcast; at 100 TB the orders
    side streams through the broadcast-hash join with zero shuffle.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
        )
    )


def q_computed_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: equi-join on an expression-derived key, as in
    `c.provider_id = p.practitioner.id` with provider_id =
    substring(claim.provider, 82, 36) (01_dbignite_sample.py:326-333).

    The derived key (formatted customer name) is computed inside the join
    condition; Catalyst still plans a hash join on the expression.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    derived = F.format_string("Customer#%09d", col("o_custkey"))
    return (
        orders.where(col("o_orderkey") < 500)
        .join(broadcast(customer), derived == customer.c_name)
        .select(
            col("o_orderkey"),
            col("c_name").alias("customer_name"),
            F.round(col("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_join_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: join + literal point filter; Catalyst pushes the filter below the
    join (01_dbignite_sample.py:588-591, `where c.CLM_ID = 737363357976870`)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .where(col("o_orderkey") == 42)
        .select("o_orderkey", "c_name", "o_orderstatus")
    )


def q_left_outer_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-outer existence flag — the reference's staging-dedupe idiom
    `case when p.patient.id is not null then 'Y' else 'N'`
    (01_dbignite_sample.py:370-379)."""
    customer = load(spark, sf_dir, "customer")
    big_orders = (
        load(spark, sf_dir, "orders")
        .where(col("o_totalprice") > 400000.0)
        .select("o_custkey")
        .distinct()
    )
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_outer"
    ).select(
        col("c_custkey"),
        F.when(col("o_custkey").isNotNull(), "Y").otherwise("N").alias(
            "record_exists_flag"
        ),
    )


def q_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 idiomatic form: LEFT SEMI — customers having at least one URGENT
    order (dedupe-lookup without duplicating rows)."""
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").where(
        col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def q_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 idiomatic form: LEFT ANTI — customers with no pending orders
    (the NOT EXISTS side of the reference's dedupe flags)."""
    customer = load(spark, sf_dir, "customer")
    pending = load(spark, sf_dir, "orders").where(col("o_orderstatus") == "P")
    return customer.join(
        pending, customer.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_multiway_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-table star join + aggregation (TPC-H Q5 shape) — the
    scaled-up analog of the reference's two-table joins feeding group-bys
    (01_dbignite_sample.py:341-346, 513-515).

    lineitem (fact) shuffles once on l_orderkey against orders; customer,
    nation and region are broadcast. Revenue rounded for oracle parity.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        lineitem.join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") == col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") == col("r_regionkey"))
        .groupBy(col("r_name").alias("region_name"))
        .agg(
            F.round(
                F.sum(col("l_extendedprice") * (1 - col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# --------------------------------------------------------------------------
# Aggregations (A*)
# --------------------------------------------------------------------------


def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's only explicit aggregate — `select claim_type_cd,
    count(1) ... group by 1` (01_dbignite_sample.py:341-346)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate over the fact table — sum/avg/count by
    two low-cardinality keys with a pushed-down date filter. Headline bench
    query: one scan, map-side partial aggregation, tiny shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(col("l_extendedprice") * (1 - col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    col("l_extendedprice")
                    * (1 - col("l_discount"))
                    * (1 + col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (SURVEY §2.4 engine-plan extra)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(col("l_returnflag").alias("returnflag"))
        .agg(F.countDistinct("l_partkey").alias("distinct_parts"))
    )


def q_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/sum/avg battery per group (SURVEY §2.4 engine-plan extra)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy(col("p_type").alias("part_type"))
        .agg(
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + post-aggregation filter (HAVING)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .where(col("order_cnt") >= 15)
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k (O*)
# --------------------------------------------------------------------------


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2+O3: multi-key descending sort + LIMIT → TakeOrderedAndProject
    (01_dbignite_sample.py:458-459). Tie-broken on the unique key so the
    top-k set is deterministic across engines."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(col("o_totalprice").desc(), col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.round(col("o_totalprice"), 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.6 — engine-plan extras)
# --------------------------------------------------------------------------


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer-nations and supplier-nations."""
    c = load(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer-nations and supplier-nations."""
    c = load(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).distinct()


# --------------------------------------------------------------------------
# Arrays / nested (P1-P3, P5, P8 — entry()-DataFrame semantics on fixtures)
# --------------------------------------------------------------------------


def q_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 + entry() collect semantics: group lineitems into a per-order array
    (the bundle-row pattern, 01_dbignite_sample.py:26,47) then explode back
    to rows (:47,63,...). Multiset-identical to the flat input, which is the
    oracle."""
    li = load(spark, sf_dir, "lineitem")
    bundled = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("parts")
    )
    return bundled.select(
        col("l_orderkey").alias("orderkey"),
        F.explode(col("parts")).alias("partkey"),
    )


def q_hof_filter_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: higher-order filter() over an array column, as in
    `filter(patient.identifier, x -> x.system == ...)` (01:435,451,453).
    Array built per order; order-insensitive measures (count, sum) keep the
    oracle deterministic despite collect_list's nondeterministic ordering."""
    li = load(spark, sf_dir, "lineitem")
    bundled = li.groupBy(col("l_orderkey").alias("orderkey")).agg(
        F.collect_list("l_quantity").alias("qtys")
    )
    big = F.filter(col("qtys"), lambda x: x > F.lit(25.0))
    return bundled.select(
        col("orderkey"),
        F.size(big).alias("n_big"),
        F.round(
            F.aggregate(big, F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("big_qty_sum"),
    )


def q_nested_struct_pluck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: build a nested struct<array<struct>> (FHIR-shaped) from flat
    rows, then pluck dotted paths back out — field-pluck over array-of-struct
    yields an array (01_dbignite_sample.py:51-55,91-93); element [0] after an
    order-insensitive array_sort keeps it deterministic."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy(col("l_orderkey").alias("orderkey")).agg(
        F.struct(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_sort(
                F.collect_list(F.struct(col("l_partkey").alias("pk")))
            ).alias("items"),
        ).alias("doc")
    )
    return nested.select(
        col("orderkey"),
        col("doc.n_lines").alias("n_lines"),
        col("doc.items.pk")[0].alias("first_part"),
    )


# --------------------------------------------------------------------------
# Windows / event analytics (SURVEY §2.8 engine extension over `events`)
# --------------------------------------------------------------------------


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-analog with window rank: latest event per user — the ADT
    'current patient status' query re-expressed as row_number()=1
    (01_dbignite_sample.py:455-459)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        col("ts").desc(), col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(col("rn") == 1)
        .select(
            "user_id",
            col("ts").alias("last_ts"),
            col("event_type").alias("last_type"),
        )
    )


def q_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static broadcast enrichment
    (`streaming/streams.py:enrich_events`, which runs identically on
    batch and streaming inputs): events LEFT JOIN the customer
    dimension — broadcast, so the event side never shuffles."""
    from interop_spark.streaming.streams import enrich_events

    ev = load(spark, sf_dir, "events")
    dim = load(spark, sf_dir, "customer")
    return enrich_events(ev, dim)


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate: per-user running sum of event value."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").where(col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(col("ts").asc(), col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + cumulative
    flag-sum — the batch form of a stateful streaming session window."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(col("ts").asc(), col("event_id").asc())
    flagged = ev.withColumn(
        "new_session",
        F.when(
            col("ts").cast("long") - F.lag(col("ts").cast("long")).over(w)
            > 1800,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("events_in_session"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# --------------------------------------------------------------------------
# Registry: queries + oracle twins
# --------------------------------------------------------------------------

QUERIES = {
    "scan_project_filter": q_scan_project_filter,
    "like_filter_or": q_like_filter_or,
    "substring_key": q_substring_key,
    "date_parts": q_date_parts,
    "case_when_literal": q_case_when_literal,
    "json_extract": q_json_extract,
    "inner_equi_join": q_inner_equi_join,
    "computed_key_join": q_computed_key_join,
    "join_filter_pushdown": q_join_filter_pushdown,
    "left_outer_exists_flag": q_left_outer_exists_flag,
    "left_semi_join": q_left_semi_join,
    "left_anti_join": q_left_anti_join,
    "multiway_join_agg": q_multiway_join_agg,
    "groupby_count": q_groupby_count,
    "pricing_summary": q_pricing_summary,
    "count_distinct": q_count_distinct,
    "agg_minmax": q_agg_minmax,
    "having_filter": q_having_filter,
    "topk_orders": q_topk_orders,
    "set_union": q_set_union,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "explode_roundtrip": q_explode_roundtrip,
    "hof_filter_array": q_hof_filter_array,
    "nested_struct_pluck": q_nested_struct_pluck,
    "latest_event_per_user": q_latest_event_per_user,
    "enrich_events": q_enrich_events,
    "running_total": q_running_total,
    "sessionize": q_sessionize,
}

ORACLE = {
    "scan_project_filter": """
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price
        FROM orders WHERE o_totalprice > 300000.0
    """,
    "like_filter_or": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_name LIKE 'Customer#00000001%' OR c_name LIKE 'Customer#00000002%'
    """,
    "substring_key": """
        SELECT c_custkey, substring(c_name, 10, 9) AS cust_num
        FROM customer WHERE c_custkey < 50
    """,
    "date_parts": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS year_of_order,
               CAST(month(o_orderdate) AS INTEGER) AS month_of_order,
               CAST(day(o_orderdate) AS INTEGER) AS day_of_order
        FROM orders WHERE o_orderkey < 100
    """,
    "case_when_literal": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN 'finished'
                    WHEN o_orderstatus = 'O' THEN 'open'
                    ELSE 'pending' END AS status_desc,
               'http://www.cms.gov/medicare' AS code_system
        FROM orders WHERE o_orderkey < 200
    """,
    "json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events WHERE event_id < 100
    """,
    "inner_equi_join": """
        SELECT c_mktsegment AS mktsegment,
               count(1) AS order_cnt,
               round(sum(o_totalprice), 2) AS total_sales
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "computed_key_join": """
        SELECT o_orderkey, c_name AS customer_name,
               round(o_totalprice, 2) AS total_price
        FROM orders JOIN customer
          ON 'Customer#' || lpad(CAST(o_custkey AS VARCHAR), 9, '0') = c_name
        WHERE o_orderkey < 500
    """,
    "join_filter_pushdown": """
        SELECT o_orderkey, c_name, o_orderstatus
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey = 42
    """,
    "left_outer_exists_flag": """
        SELECT c_custkey,
               CASE WHEN b.o_custkey IS NOT NULL THEN 'Y' ELSE 'N' END
                 AS record_exists_flag
        FROM customer
        LEFT OUTER JOIN (SELECT DISTINCT o_custkey FROM orders
                         WHERE o_totalprice > 400000.0) b
          ON c_custkey = b.o_custkey
    """,
    "left_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "left_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderstatus = 'P')
    """,
    "multiway_join_agg": """
        SELECT r_name AS region_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(1) AS line_cnt
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "groupby_count": """
        SELECT o_orderpriority AS priority, count(1) AS cnt
        FROM orders GROUP BY 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                 AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(1) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "count_distinct": """
        SELECT l_returnflag AS returnflag,
               count(DISTINCT l_partkey) AS distinct_parts
        FROM lineitem GROUP BY 1
    """,
    "agg_minmax": """
        SELECT p_type AS part_type,
               min(p_size) AS min_size, max(p_size) AS max_size,
               round(sum(p_retailprice), 2) AS sum_price,
               round(avg(p_retailprice), 4) AS avg_price
        FROM part GROUP BY 1
    """,
    "having_filter": """
        SELECT o_custkey AS custkey, count(1) AS order_cnt
        FROM orders GROUP BY 1 HAVING count(1) >= 15
    """,
    "topk_orders": """
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "set_union": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_except": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL
          SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "explode_roundtrip": """
        SELECT l_orderkey AS orderkey, l_partkey AS partkey FROM lineitem
    """,
    "hof_filter_array": """
        SELECT l_orderkey AS orderkey,
               CAST(count(1) FILTER (WHERE l_quantity > 25.0) AS INTEGER) AS n_big,
               round(coalesce(sum(l_quantity) FILTER (WHERE l_quantity > 25.0),
                              0.0), 2) AS big_qty_sum
        FROM lineitem GROUP BY 1
    """,
    "nested_struct_pluck": """
        SELECT l_orderkey AS orderkey,
               count(1) AS n_lines,
               min(l_partkey) AS first_part
        FROM lineitem GROUP BY 1
    """,
    "latest_event_per_user": """
        SELECT user_id, ts AS last_ts, event_type AS last_type
        FROM (SELECT user_id, ts, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "enrich_events": """
        SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
               c.c_name AS customer_name, c.c_mktsegment AS mktsegment
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    "running_total": """
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW), 2) AS running_value
        FROM events WHERE user_id < 10
    """,
    "sessionize": """
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                      > 1800 THEN 1 ELSE 0 END AS new_session
          FROM events
        ), sess AS (
          SELECT user_id, value,
                 CAST(sum(new_session) OVER (PARTITION BY user_id
                                             ORDER BY ts ASC, event_id ASC
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS BIGINT)
                   AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, count(1) AS events_in_session,
               round(sum(value), 2) AS session_value
        FROM sess GROUP BY user_id, session_id
    """,
}
