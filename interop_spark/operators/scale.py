"""Scale-engineering utilities: skew-aware joins and partitioned layouts.

These are the knobs a 100 TB deployment turns when AQE alone isn't enough:

- ``salted_join``: explicit key-salting for pathologically skewed join
  keys (one hot bundleUUID / user_id). The small side is replicated
  ``salt`` times (exploded), the big side gets a deterministic salt from a
  uniform hash of its row — so the hot key's rows spread over ``salt``
  reducers. AQE's skew-join split handles moderate skew; salting is for
  the 1000× hot-key case where a single partition would spill.
- ``write_partitioned`` / partition pruning: date-partitioned parquet
  layout so time-ranged queries scan only matching directories
  (verified by test: the plan's partition count drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with ``salt``-way key salting.

    big side: salt_i = pmod(hash(whole row key + a stable discriminator), salt)
    — here a uniform pseudo-random derived from xxhash64 of the key plus
    monotonically varying payload isn't available generically, so we hash
    the key with ``spark_partition_id``-free randomness substitute:
    xxhash64(key, monotonically_increasing_id) would be nondeterministic
    under retries; instead we spread by xxhash64 of ALL big-side columns,
    which is deterministic per row.

    Only ``inner`` and big-side-preserving outer joins (``left``/
    ``left_outer``) are supported: replicating the small side ``salt``
    times would emit each unmatched small-side row ``salt`` times under
    right/full outer, and semi/anti semantics invert which side may be
    replicated. Limitation: big-side rows that are FULLY identical hash to
    the same salt, so a hot key consisting of duplicate rows does not
    spread — pre-tag such data with a distinct column first.
    """
    allowed = {"inner", "left", "left_outer", "leftouter"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: "
            "the salt-replicated small side would duplicate unmatched "
            "rows under right/full outer (and flip sides for semi/anti)"
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[col(c) for c in big.columns]), F.lit(salt))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    exprs: dict,
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-salted aggregation — the group-by twin of
    ``salted_join``: partial-aggregate by (key, salt) so a
    pathologically hot key spreads over ``salt`` reducers, then combine
    the partials by key. (Spark's own partial aggregation already
    map-combines; explicit salting adds a REDUCER-side split for the
    hot-key case where even combined partials of one key overwhelm a
    single task — e.g. high-cardinality payloads under collect-style or
    distinct-style aggregates, or AQE disabled.)

    ``exprs`` maps output name -> (partial aggregate Column, combine)
    where combine is one of "sum" / "min" / "max" — the decomposable
    combines (count and sum re-combine by SUM; avg is sum/count
    composed by the caller). Non-decomposable aggregates don't belong
    here; that's the point of the salt.

    ``salt_on``: a column whose hash spreads rows across salts;
    defaults to a hash of all columns (deterministic per row, retry-safe
    — never rand()).
    """
    spread = (
        F.xxhash64(col(salt_on))
        if salt_on is not None
        else F.xxhash64(*[col(c) for c in df.columns])
    )
    partial = (
        df.withColumn("_salt", F.pmod(spread, F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(*[e.alias(f"_p_{n}") for n, (e, _) in exprs.items()])
    )
    combine = {"sum": F.sum, "min": F.min, "max": F.max}
    bad = [c for _, (_, c) in exprs.items() if c not in combine]
    if bad:
        raise ValueError(f"salted_agg combine must be sum/min/max, got {bad}")
    return partial.groupBy(key).agg(
        *[combine[c](f"_p_{n}").alias(n) for n, (e, c) in exprs.items()]
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet layout (the physical design that makes
    partition pruning possible)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_date_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    """Add year/month partition columns from an event-time column."""
    return df.withColumn("p_year", F.year(col(ts_col))).withColumn(
        "p_month", F.month(col(ts_col))
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table: two tables bucketed the same way join
    WITHOUT a shuffle (the physical plan shows no Exchange on either side).
    At 100 TB this is the difference between re-shuffling the fact table on
    every join and reading it pre-co-located.

    Buckets also bound per-task memory for bucketed reads and enable
    bucket-pruned point lookups.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def salted_grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    salt_expr,
    salts: int = 8,
) -> DataFrame:
    """EXACT per-group top-k (smallest ``order_col`` first) via salted
    two-phase rank — the hot-group-safe form of
    ``row_number() OVER (PARTITION BY group ORDER BY key) <= k``.

    Correctness: a group's k smallest order keys are each among the k
    smallest of their own salt cell, so ranking (group × salt) cells
    first and re-ranking the ≤ salts·k survivors loses nothing.
    ``order_col`` MUST be a total order within each group (e.g. a hash
    of a unique id — the ``stratified_reservoir`` pattern): with ties,
    row_number is free to pick either side per evaluation and the two
    phases may disagree.

    Scale accounting (plan-verified in tests/test_selection_ops.py):
    Spark's rank-limit pushdown (WindowGroupLimit Partial) caps every
    map task at k rows per window group BEFORE each exchange, so even
    the naive single window shuffles ≤ P·k rows per group (P =
    upstream partitions); the salt phase tightens the final
    one-reducer sort from P·k (P ≈ 10⁵ at 100 TB) to a constant
    salts·k, keeping the last rank O(k) regardless of cluster width.
    ``salt_expr`` is any deterministic int Column spreading rows
    within a group (``F.pmod(unique_id, salts)``); determinism keeps
    the OUTPUT deterministic, uniformity keeps phase 1 balanced.

    Returns the top-k rows per group with a 1-based ``rk`` rank
    column (long); internal columns are dropped.
    """
    from pyspark.sql.window import Window

    salted = df.select("*", salt_expr.alias("_sgt_salt"))
    w1 = Window.partitionBy(*group_cols, "_sgt_salt").orderBy(order_col)
    cell = salted.select(
        "*", F.row_number().over(w1).alias("_sgt_r1")
    ).where(col("_sgt_r1") <= k)
    w2 = Window.partitionBy(*group_cols).orderBy(order_col)
    return (
        cell.select(
            *df.columns, F.row_number().over(w2).alias("_sgt_rk")
        )
        .where(col("_sgt_rk") <= k)
        .withColumnRenamed("_sgt_rk", "rk")
        .withColumn("rk", col("rk").cast("long"))
    )
