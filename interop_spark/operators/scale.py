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
