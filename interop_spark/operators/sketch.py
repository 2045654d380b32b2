"""Engine-exact HyperLogLog core (round-13), shared by the batch query
(`queries/selection_q.py:hll_distinct_estimate`) and the streaming
register-merge twin (`queries/temporal_q.py:stream_hll_users`).

Determinism contract (the CountMin/Bloom trick applied to cardinality):
the hash is a seeded md5 slice, ranks come from integer bit-length
(``length(bin(w))`` — no float log), and the harmonic sum is a sum of
dyadic rationals (each ``2^-reg`` has a single mantissa bit, reg ≤ 41,
≤256 terms → exact in a 53-bit double under ANY summation order), so
the estimate is oracle-pinned rather than statistically close. The
small-range linear-counting correction is deliberately omitted (ln is
not exact-rounded cross-engine); production estimators layer
LogLog-Beta on top.

Scale shape: one projection + a ≤2^p-key max aggregate — partial max
collapses every map task to at most m rows. Registers are MERGEABLE
(per-bucket max is associative/commutative), which is what makes the
sketch a streaming/foreachBatch citizen: merging per-micro-batch
registers converges to the single-pass registers for any batch split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 40  # rank bits after the register index (48-bit md5 slice)
# Flajolet et al. 2007 bias constant for m >= 128, computed once so the
# Spark literal and the oracle literal are the same double
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, key: Column) -> DataFrame:
    """(bucket, reg) register frame for the keys in ``df`` — the whole
    sketch, ≤``HLL_M`` rows. ``key`` is any Column; it is cast to
    string before hashing so integer and string keys share the
    derivation."""
    h = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    slotted = df.select(
        (h % HLL_M).alias("bucket"),
        (h / F.lit(HLL_M)).cast("bigint").alias("tail"),
    )
    return (
        slotted.select(
            "bucket",
            F.when(col("tail") == 0, F.lit(HLL_WBITS + 1))
            .otherwise(F.lit(HLL_WBITS) - F.length(F.bin(col("tail"))) + 1)
            .cast("int")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register frames into one (per-bucket max) — the
    associative merge a foreachBatch accumulator or a shard-combiner
    applies."""
    return a.unionByName(b).groupBy("bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """One-row (hll_estimate, n_empty_buckets) from a register frame;
    empty buckets contribute 2^0 to the harmonic sum per the raw
    Flajolet estimator."""
    sums = regs.agg(
        F.sum(F.pow(F.lit(2.0), -col("reg"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    return sums.select(
        F.round(
            F.lit(HLL_ALPHA)
            * F.lit(float(HLL_M * HLL_M))
            / (col("s_present") + (F.lit(HLL_M) - col("n_present"))),
            6,
        ).alias("hll_estimate"),
        (F.lit(HLL_M) - col("n_present")).cast("long").alias(
            "n_empty_buckets"
        ),
    )
