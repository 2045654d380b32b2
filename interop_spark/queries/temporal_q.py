"""Temporal join queries: as-of join and bucketized range join over the
event stream, with DuckDB oracle twins mirroring the same window/bucket
construction (so both engines execute identical logic — the oracle is not
a different algorithm, which keeps tie handling exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load
from interop_spark.operators.temporal import asof_join, range_pairs_within


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the most recent prior (or simultaneous)
    click by the same user — union+window as-of join, one shuffle."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.where(col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id", "value"],
        tie_col="_rv_event_id",
    )
    return out.select(
        "user_id",
        col("event_id").alias("purchase_id"),
        col("asof_event_id").alias("last_click_id"),
        F.round(col("asof_value"), 2).alias("last_click_value"),
    )


def q_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs by the same user within 300 seconds — bucketized range
    join (equi-join on coarse buckets + exact filter), restricted to a
    user slice to keep the oracle's quadratic check cheap."""
    ev = load(spark, sf_dir, "events").where(col("user_id") < 40)
    return range_pairs_within(
        ev, key="user_id", ts="ts", id_col="event_id", delta_seconds=300
    )


QUERIES = {
    "asof_join": q_asof_join,
    "range_join_pairs": q_range_join_pairs,
}

ORACLE = {
    "asof_join": """
        WITH u AS (
          SELECT user_id, ts, 1 AS side, event_id,
                 CAST(NULL AS BIGINT) AS rv_event_id,
                 CAST(NULL AS DOUBLE) AS rv_value
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, event_id, value
          FROM events WHERE event_type = 'click'
        ),
        carried AS (
          SELECT *,
                 last_value(rv_event_id IGNORE NULLS) OVER w AS last_click_id,
                 last_value(rv_value IGNORE NULLS) OVER w AS last_click_value
          FROM u
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts ASC, side ASC, rv_event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id AS purchase_id, last_click_id,
               round(last_click_value, 2) AS last_click_value
        FROM carried WHERE side = 1
    """,
    "range_join_pairs": """
        SELECT a.user_id,
               a.event_id AS id_a, b.event_id AS id_b,
               abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) AS gap_seconds
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
        WHERE a.user_id < 40 AND b.user_id < 40
          AND abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) <= 300
    """,
}
