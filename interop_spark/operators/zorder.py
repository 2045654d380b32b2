"""Z-order (Morton) multi-dimensional data layout.

The reference's Delta sink family implies OPTIMIZE/ZORDER as the
production layout step (the Delta boundary note in STATUS.md); the
TECHNIQUE itself is engine-independent bit arithmetic + range
partitioning, so this module provides it relationally: interleave the
bits of two normalized dimension keys into one Morton code, then
cluster/partition by code ranges. Files laid out this way give
MULTI-dimensional data skipping — a fixed-width Z bucket's bounding
box covers a small fraction of EACH dimension, where a single-column
sort gives min/max pruning on one dimension only and none on the
other. At 100 TB the layout pass is `repartitionByRange(z)` + sorted
parquet writes; everything here is whole-stage-codegen integer
arithmetic (one F.aggregate fold per row, no shuffle of its own).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints truncated to ``bits`` bits
    each: bit i of x lands at position 2i, bit i of y at 2i+1. One
    whole-stage-codegen HOF fold; bit i is extracted arithmetically
    (floor(v / 2^i) mod 2) so the IDENTICAL expression is ANSI-SQL
    expressible for the DuckDB oracle twin (list_transform/list_sum).
    Exact in doubles: the largest intermediate is < 2^(2*bits) << 2^52
    at the default 16 bits."""
    xs, ys = x.cast("bigint"), y.cast("bigint")
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + (
            (F.floor(xs / F.pow(F.lit(2.0), i)).cast("bigint") % 2)
            * F.pow(F.lit(2.0), i * 2).cast("bigint")
        )
        + (
            (F.floor(ys / F.pow(F.lit(2.0), i)).cast("bigint") % 2)
            * F.pow(F.lit(2.0), i * 2 + 1).cast("bigint")
        ),
    )


def z_bucket(z: Column, bits: int = 16, bucket_bits: int = 4) -> Column:
    """Fixed-width Z range bucket: the top ``bucket_bits`` bits of the
    2*bits-wide code — deterministic splits (no sampled range
    partitioner), so an oracle can rebuild the identical assignment.
    ``2**bucket_bits`` buckets; with bucket_bits=4 each bucket's
    bounding box spans 1/4 of each dimension's domain (2 top bits per
    dimension), versus a single-column sort's 1/16 of one dimension
    and ALL of the other."""
    shift = 2 * bits - bucket_bits
    return F.floor(z / F.pow(F.lit(2.0), shift)).cast("int")
