"""Temporal join operators Spark lacks natively: as-of join and
bucketized range join — composed from shuffles Spark already does well
(SURVEY task brief: custom operators as compositions of existing
DataFrame ops, not UDFs).

as-of join (union + window)
---------------------------
``asof_join(left, right, ...)`` matches each left row with the most
recent right row at-or-before its timestamp, per key. Instead of a
range-condition join (which Spark plans as a broadcast-nested-loop or an
exploded range join), both sides are UNIONed, sorted once per key by
(ts, side-priority), and the right values are carried forward with
``last(..., ignorenulls)``. One shuffle on the key, no quadratic work,
state bounded per key — identical cost shape to any window aggregate.

range join (bucket equi-join)
-----------------------------
``range_pairs_within`` finds pairs within ``delta`` seconds by joining on
coarse time buckets of width ``delta`` (each row joins its own and the
next bucket) and filtering exactly — turning an O(n²) interval condition
into an equi-join whose bucket key grows with the time span, with at
most 2× row duplication. This is the standard scalable form of the
interval/range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row with right_ts <= left_ts,
    per key. Returns left columns + ``value_cols`` (NULL when no prior
    right row exists)."""
    lt = left.select(
        col(key).alias("_k"),
        col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        *[col(c) for c in left.columns if c not in (key,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in value_cols],
    )
    rt = right.select(
        col(key).alias("_k"),
        col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key,)],
        *[col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt)
    order = [col("_ts").asc(), col("_side").asc()]
    if tie_col is not None:
        order.append(col(tie_col).asc_nulls_first())
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_last_{c}")
            for c in value_cols
        ],
    )
    out_cols = (
        [col("_k").alias(key)]
        + [col(c) for c in left.columns if c not in (key,)]
        + [col(f"_last_{c}").alias(f"asof_{c}") for c in value_cols]
    )
    return carried.where(col("_side") == 1).select(*out_cols)


def range_pairs_within(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    delta_seconds: int,
) -> DataFrame:
    """All pairs (a, b) with the same key, id_a < id_b, and
    |ts_a - ts_b| <= delta, via coarse-bucket equi-join."""
    delta = delta_seconds
    epoch = col(ts).cast("long")
    base = df.select(
        col(key).alias("_k"),
        col(id_col).alias("_id"),
        epoch.alias("_e"),
        (epoch / delta).cast("long").alias("_b0"),
    )
    # each row probes its own and both neighbor buckets: a pair within
    # delta differs by at most one bucket in either direction (id order,
    # not time order, breaks the pair symmetry, so both directions occur)
    probed = base.select(
        "_k",
        "_id",
        "_e",
        F.explode(
            F.array(col("_b0") - 1, col("_b0"), col("_b0") + 1)
        ).alias("_b"),
    )
    a = base.alias("a")
    b = probed.alias("b")
    pairs = (
        a.join(
            b,
            (col("a._k") == col("b._k"))
            & (col("a._b0") == col("b._b"))
            & (col("a._id") < col("b._id")),
        )
        .where(F.abs(col("a._e") - col("b._e")) <= delta)
        .select(
            col("a._k").alias(key),
            col("a._id").alias("id_a"),
            col("b._id").alias("id_b"),
            F.abs(col("a._e") - col("b._e")).alias("gap_seconds"),
        )
        .distinct()
    )
    return pairs
