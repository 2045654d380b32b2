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


def _spread_bits(v: Column) -> Column:
    """Interleave-spread a 32-bit value's bits into the even positions
    of a 64-bit word (the classic Morton magic-mask doubling ladder —
    5 shift/or/mask steps instead of a per-bit loop)."""
    s = v
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        s = s.bitwiseOR(F.shiftleft(s, shift)).bitwiseAND(F.lit(mask))
    return s


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints truncated to ``bits`` bits
    each: bit i of x lands at position 2i, bit i of y at 2i+1.

    Pure whole-stage-codegen integer shift/mask arithmetic (the
    magic-mask spread ladder): ~22 bitwise ops per row, no per-row
    array, no per-bit fold. (The pre-r19 form was an ``F.aggregate``
    fold over ``sequence(0, bits-1)`` with four ``pow()`` calls per
    bit — interpreted HOF evaluation that made this projection the
    whole query's bottleneck; the r19 optimization round replaced it
    with this bit ladder, byte-identical output on the non-negative
    domain.) The DuckDB oracle twin keeps the arithmetic per-bit form —
    the two are exactly equal on non-negative inputs, which the layout
    normalization guarantees."""
    if bits > 32:
        raise ValueError(f"bits must be <= 32, got {bits}")
    trunc = (1 << bits) - 1
    xs = x.cast("bigint").bitwiseAND(F.lit(trunc))
    ys = y.cast("bigint").bitwiseAND(F.lit(trunc))
    return _spread_bits(xs).bitwiseOR(F.shiftleft(_spread_bits(ys), 1))


def z_bucket(z: Column, bits: int = 16, bucket_bits: int = 4) -> Column:
    """Fixed-width Z range bucket: the top ``bucket_bits`` bits of the
    2*bits-wide code — deterministic splits (no sampled range
    partitioner), so an oracle can rebuild the identical assignment.
    ``2**bucket_bits`` buckets; with bucket_bits=4 each bucket's
    bounding box spans 1/4 of each dimension's domain (2 top bits per
    dimension), versus a single-column sort's 1/16 of one dimension
    and ALL of the other."""
    shift = 2 * bits - bucket_bits
    return F.shiftright(z, shift).cast("int")
