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


# ---------------------------------------------------------------------------
# Mergeable rank/quantile sketch (round-14): hash-level sampling.
#
# The streaming/unbounded twin of `domain_quantile_filter`'s exact
# histogram: that query is exact only because its scores live in a
# bounded integer range; this sketch estimates ranks/quantiles of an
# UNBOUNDED value column in O(capacity) state. Each item's LEVEL is the
# leading-zero count of a seeded 32-bit md5 slice of its unique key
# (P[level >= t] = 2^-t — the distinct-sampling / bottom-k discipline,
# Gibbons VLDB 2001; Cohen & Kaplan 2007), and the sketch keeps exactly
# the items at level >= T, where T is the smallest threshold whose
# survivor count fits the capacity. Every survivor at threshold T
# represents 2^T items, so est_rank(v) = 2^T * |{kept <= v}|.
#
# Determinism contract (the HLL discipline applied to ranks): the level
# is integer bit-length arithmetic on an md5 slice — no randomness, no
# floats — and T is a pure function of the LEVEL HISTOGRAM, so the kept
# set is a pure function of the data SET. That makes the sketch
# (a) oracle-exact (DuckDB replays the same md5/bin/shift integers) and
# (b) PROVABLY mergeable: histograms add; T is monotone under union
# (counts only grow), so each batch's kept set at its own T_b is a
# superset of the merged kept set at T_m >= T_b, and union-then-filter
# equals the one-pass sketch EXACTLY — not just in distribution.
#
# Scale shape: the build is one narrow projection + a <=33-key partial-
# aggregated histogram; the survivor filter is a second scan-side
# projection against a broadcast 1-row threshold (at 100 TB you rescan
# 2 pruned columns rather than cache the corpus). Estimation runs on
# the capacity-bounded survivor frame only.
# ---------------------------------------------------------------------------

RS_HBITS = 32  # hash width: level in [0, 32]
RS_CAPACITY = 128  # max survivors the sketch retains


def rank_sketch_items(df: DataFrame, value: Column, key: Column) -> DataFrame:
    """(v, level) item frame: ``value`` carried verbatim (the sketch
    never does arithmetic on it — only ordering), level = leading-zero
    count of the 32-bit seeded hash of ``key`` (unique per item)."""
    h = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return df.select(
        value.alias("v"),
        F.when(h == 0, F.lit(RS_HBITS))
        .otherwise(F.lit(RS_HBITS) - F.length(F.bin(h)))
        .cast("int")
        .alias("level"),
    )


def rank_sketch_hist(items: DataFrame) -> DataFrame:
    """(level, cnt) level histogram — <=33 rows, mergeable by sum."""
    return items.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def rank_sketch_threshold(hist: DataFrame, capacity: int = RS_CAPACITY) -> DataFrame:
    """One-row (t) frame: the SMALLEST t in [0, 33] whose survivor
    count sum(cnt | level >= t) fits the capacity. Evaluated over the
    full candidate range (not just observed levels) so that when the
    whole input fits, t = 0 and est_rank is exact with weight 1."""
    spark = hist.sparkSession
    ts = spark.range(0, RS_HBITS + 2).select(col("id").cast("int").alias("t"))
    tails = (
        ts.join(F.broadcast(hist), col("level") >= col("t"), "left")
        .groupBy("t")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("tail"))
    )
    return tails.where(col("tail") <= capacity).agg(
        F.min("t").cast("int").alias("t")
    )


def rank_sketch_build(
    df: DataFrame, value: Column, key: Column, capacity: int = RS_CAPACITY
) -> DataFrame:
    """The sketch as ONE mergeable frame of tagged rows:
    ``('h', level, NULL, cnt)`` histogram rows plus
    ``('k', level, v, 1)`` survivor rows at the build's threshold.

    The <=33-row histogram is localCheckpoint-ed (the kmeans/HLL
    discipline) so the threshold derivation and the histogram output
    rows read the materialized frame instead of re-scanning the corpus
    — the whole build costs exactly TWO pruned corpus scans (histogram
    pass + survivor filter)."""
    items = rank_sketch_items(df, value, key)
    hist = rank_sketch_hist(items).localCheckpoint()
    thr = rank_sketch_threshold(hist, capacity)
    kept = items.crossJoin(F.broadcast(thr)).where(
        col("level") >= col("t")
    )
    return hist.select(
        F.lit("h").alias("kind"), "level",
        F.lit(None).cast("double").alias("v"), "cnt",
    ).unionByName(
        kept.select(
            F.lit("k").alias("kind"), "level", "v",
            F.lit(1).cast("long").alias("cnt"),
        )
    )


def rank_sketch_merge(
    a: DataFrame, b: DataFrame, capacity: int = RS_CAPACITY
) -> DataFrame:
    """Merge two sketch frames: histograms ADD per level; the merged
    threshold is recomputed from the merged histogram and the unioned
    survivors re-filtered to it — provably equal to the one-pass sketch
    of the union (T is monotone under union, see module comment)."""
    u = a.unionByName(b)
    hist = (
        u.where(col("kind") == "h")
        .groupBy("level")
        .agg(F.sum("cnt").alias("cnt"))
    )
    thr = rank_sketch_threshold(hist, capacity)
    kept = (
        u.where(col("kind") == "k")
        .crossJoin(F.broadcast(thr))
        .where(col("level") >= col("t"))
    )
    return hist.select(
        F.lit("h").alias("kind"), "level",
        F.lit(None).cast("double").alias("v"), "cnt",
    ).unionByName(kept.select("kind", "level", "v", "cnt"))


def rank_sketch_quantiles(
    sketch: DataFrame, qs: list[tuple[str, int, int]] | None = None
) -> DataFrame:
    """Quantile estimates off a sketch frame. The survivors are a
    deterministic uniform sample of the input (each item kept iff its
    hash level >= T — coordinated/bottom-k sampling), so the estimate
    SELF-NORMALIZES: quantile q is the sample quantile, i.e. the
    smallest survivor v with ``|kept <= v| * den >= num * n_kept`` —
    an ALL-INTEGER comparison both engines evaluate identically, and
    one that cancels the tail-count bias a raw ``2^T * count`` scale-up
    carries (the per-level population only EXPECTS n/2^T members).
    ``est_rank`` reports the implied corpus rank ``(n * ck) div
    n_kept``. Emits (quantile, est_value, est_rank, n_total,
    threshold_level, n_kept); always selectable — the max survivor
    qualifies for every q <= 1.

    The input sketch frame is capacity-bounded BY CONSTRUCTION, so it
    is localCheckpoint-ed up front: every estimation branch (threshold,
    totals, cumulative ranks, one pick per quantile) reads the tiny
    materialized frame instead of re-deriving the build's corpus
    scans."""
    from pyspark.sql.window import Window

    qs = qs or [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    # coalesce(1) before the checkpoint (r19 optimization round): the
    # frame is capacity-bounded (<= capacity survivors + <= 33
    # histogram rows), but inherits the build's shuffle fan-out — every
    # estimation branch was scanning it 33-tasks-wide for nothing.
    sketch = sketch.coalesce(1).localCheckpoint()
    hist = sketch.where(col("kind") == "h").select("level", "cnt")
    thr = rank_sketch_threshold(hist)
    # n and n_kept in ONE pass over the materialized frame (r19): two
    # conditional aggregates instead of two branch jobs.
    totals = sketch.agg(
        F.sum(F.when(col("kind") == "h", col("cnt"))).alias("n"),
        F.count(F.when(col("kind") == "k", F.lit(1)))
        .cast("long")
        .alias("n_kept"),
    )
    kept = sketch.where(col("kind") == "k")
    cum = (
        kept.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "ck",
            F.sum("c").over(
                Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .crossJoin(F.broadcast(totals))
        .withColumn("est_rank", F.expr("(n * ck) div n_kept"))
    )
    # ONE aggregation computes every quantile's pick (r19: the per-
    # quantile agg-plus-union built 3 aggregate branches and 2 unions —
    # 5 extra bounded jobs); the picks then unfold via a literal-struct
    # explode. The per-quantile min/when aggregates are unchanged, so
    # the picked values are identical.
    agg_exprs = []
    for label, num, den in qs:
        qualifies = col("ck") * den >= col("n_kept") * num
        agg_exprs.append(
            F.min(F.when(qualifies, col("v"))).alias(f"_ev_{label}")
        )
        agg_exprs.append(
            F.min(F.when(qualifies, col("est_rank"))).alias(
                f"_er_{label}"
            )
        )
    one = cum.agg(*agg_exprs)
    out = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(label).alias("quantile"),
                        col(f"_ev_{label}").alias("est_value"),
                        col(f"_er_{label}").alias("est_rank"),
                    )
                    for label, _, _ in qs
                ]
            )
        ).alias("_q")
    ).select("_q.quantile", "_q.est_value", "_q.est_rank")
    return (
        out.crossJoin(
            F.broadcast(totals.select(col("n").alias("n_total")))
        )
        .crossJoin(
            F.broadcast(thr.select(col("t").alias("threshold_level")))
        )
        .crossJoin(F.broadcast(totals.select("n_kept")))
    )


def rank_sketch_group_quantile(
    df: DataFrame,
    group: Column,
    value: Column,
    key: Column,
    capacity: int = RS_CAPACITY,
    num: int = 9,
    den: int = 10,
) -> DataFrame:
    """PER-GROUP quantile estimation — the grouped form of the rank
    sketch, i.e. per-domain thresholds on an UNBOUNDED score column in
    O(groups * capacity) state (what `domain_quantile_filter`'s exact
    histogram cannot give once scores leave a bounded integer range).
    Each group runs its own hash-level sample: per-(group, level)
    histogram, per-group threshold T_g (smallest t whose survivor
    count fits the capacity), survivors at level >= T_g, and the
    sample quantile via the same all-integer comparison as
    :func:`rank_sketch_quantiles`. Emits one row per group:
    (g, est_value, est_rank, n_total, threshold_level, n_kept).

    Scale shape: corpus-side cost is ONE (group, level) partial-
    aggregated histogram (<=33 rows per group) plus the survivor
    filter against the broadcast per-group thresholds; the candidate
    grid, cumulative ranks and quantile picks all run on
    groups-x-capacity-bounded frames."""
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    items = df.select(
        group.alias("g"),
        value.alias("v"),
        F.when(h == 0, F.lit(RS_HBITS))
        .otherwise(F.lit(RS_HBITS) - F.length(F.bin(h)))
        .cast("int")
        .alias("level"),
    )
    # the (group, level) histogram and the survivor frame are bounded
    # by construction — localCheckpoint both so the grid/threshold/
    # rank/pick branches never re-derive the corpus scans (the build
    # costs exactly two pruned scans, as in rank_sketch_build)
    hist = (
        items.groupBy("g", "level")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # groups x <=33 rows — collapse the shuffle fan-out before the
        # checkpoint so downstream branches scan 1 task, not the
        # session's shuffle width (r19 optimization round)
        .coalesce(1)
        .localCheckpoint()
    )
    spark = df.sparkSession
    ts = spark.range(0, RS_HBITS + 2).select(
        col("id").cast("int").alias("t")
    )
    grid = hist.select("g").distinct().crossJoin(F.broadcast(ts))
    h2 = hist.select(
        col("g").alias("hg"), col("level"), col("cnt")
    )
    tails = (
        grid.join(
            h2, (col("g") == col("hg")) & (col("level") >= col("t")), "left"
        )
        .groupBy("g", "t")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("tail"))
    )
    thr = (
        tails.where(col("tail") <= capacity)
        .groupBy("g")
        .agg(F.min("t").cast("int").alias("t"))
    )
    n = hist.groupBy("g").agg(F.sum("cnt").alias("n"))
    kept = (
        items.join(F.broadcast(thr), "g")
        .where(col("level") >= col("t"))
        # groups x capacity rows — same fan-out collapse as hist (r19)
        .coalesce(1)
        .localCheckpoint()
    )
    nk = kept.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    # kept carries each group's threshold t (from the thr join), and
    # cum joins n/n_kept anyway — so the pick aggregation can emit
    # every output column itself and the three per-column broadcast
    # assembly joins disappear (r19 optimization round). All carried
    # values are constant within a group, so F.min reproduces them
    # exactly.
    cum = (
        kept.groupBy("g", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.min("t").cast("int").alias("t"),
        )
        .withColumn(
            "ck",
            F.sum("c").over(
                Window.partitionBy("g")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .join(F.broadcast(nk), "g")
        .join(F.broadcast(n), "g")
        .withColumn("er", F.expr("(n * ck) div n_kept"))
    )
    return (
        cum.where(col("ck") * den >= col("n_kept") * num)
        .groupBy("g")
        .agg(
            F.min("v").alias("est_value"),
            F.min("er").alias("est_rank"),
            F.min("n").alias("n_total"),
            F.min("t").alias("threshold_level"),
            F.min("n_kept").alias("n_kept"),
        )
    )
