"""Round-8 data-selection / retrieval / CDC promotions (new module so
``pipeline.py`` / ``pipeline_ext.py`` / ``temporal_q.py`` — and their
out-of-window green rows — stay untouched; see the window invariant
note in ``queries/__init__``).

Adds five oracle-backed driver queries:

- ``dsir_importance`` — DSIR importance weighting (Xie et al. 2023)
- ``bm25_topk`` — Okapi BM25 lexical retrieval top-k
- ``minhash_est_error`` — MinHash estimate-vs-exact Jaccard
  instrumentation (the dedup analog of ``ivf_recall_at_k``: a sketch
  quality regression would otherwise stay green)
- ``percentile_agg`` — exact linear-interpolation percentiles
- ``scd2_intervals`` — SCD-2 validity intervals from an event stream
  (the change-data-capture shape the reference's Delta MERGE sinks
  feed; cf. `01_dbignite_sample.py:221-223`'s upsert tables)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load
from interop_spark.operators import dedup as dd
from interop_spark.operators import retrieval as rt
from interop_spark.queries.pipeline import (
    BANDS,
    DUP_OFFSET,
    MINHASH_K,
    ROWS,
    SHINGLE_N,
    _dk_band_keys,
    _dk_minhash_sig,
    _dk_shingles,
    _with_near_dups,
)

DSIR_TARGET_LANG = "en"
BM25_TERMS = ("hash", "join", "vector", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
_PCTS = (0.25, 0.5, 0.75, 0.9)


# --------------------------------------------------------------------------
# DSIR importance weighting
# --------------------------------------------------------------------------

def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weighting: fit hashed-bigram
    bucket log-ratios with English docs as the target distribution, then
    score every document with its log importance weight and the
    resample-keep flag (λ-sum > 0 ⇔ doc looks more target- than
    raw-like). Fit = one explode + 256-key groupBy collected to the
    driver (the broadcast-the-model pattern); score = one zero-shuffle
    row-local fold."""
    d = load(spark, sf_dir, "documents")
    lam = rt.dsir_fit_logratios(
        d.withColumn("_is_t", col("lang") == DSIR_TARGET_LANG),
        "text",
        "_is_t",
    )
    score = F.round(rt.dsir_logratio(col("text"), lam), 6) + F.lit(0.0)
    return d.select(
        "doc_id",
        score.alias("dsir_logratio"),
        (score > F.lit(0.0)).alias("keep"),
    )


def _dsir_oracle() -> str:
    nb = rt.DSIR_BUCKETS
    toks = "string_split_regex(trim(text), '\\s+')"
    grams = (
        f"list_transform(generate_series(1, greatest(len({toks}) - 1, 1)),"
        f" i -> array_to_string(({toks})[i:i+1], ' '))"
    )
    bucket = (
        "CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % " + str(nb)
    )
    bucket_x = bucket.replace("md5(g)", "md5(x)")
    return f"""
        WITH flat AS (
          SELECT lang = '{DSIR_TARGET_LANG}' AS is_t, {bucket} AS b
          FROM documents, unnest({grams}) AS u(g)
          WHERE text IS NOT NULL
        ),
        counts AS (
          SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc,
                    sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS rc
          FROM flat GROUP BY b
        ),
        buckets AS (
          SELECT s.b, 1 + coalesce(c.tc, 0) AS tc, 1 + coalesce(c.rc, 0) AS rc
          FROM generate_series(0, {nb - 1}) AS s(b)
          LEFT JOIN counts c ON s.b = c.b
        ),
        lam AS (
          SELECT list(ln(tc) - ln(rc) - ln(t.tt) + ln(t.tr) ORDER BY b) AS arr
          FROM buckets, (SELECT sum(tc) AS tt, sum(rc) AS tr FROM buckets) t
          GROUP BY t.tt, t.tr
        ),
        scored AS (
          SELECT d.doc_id,
                 CASE WHEN d.text IS NULL THEN NULL ELSE
                   round(list_sum(list_transform({grams},
                     x -> l.arr[({bucket_x}) + 1])), 6) + 0.0
                 END AS dsir_logratio
          FROM documents d, lam l
        )
        SELECT doc_id, dsir_logratio, dsir_logratio > 0.0 AS keep
        FROM scored
    """


# --------------------------------------------------------------------------
# BM25 top-k retrieval
# --------------------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the fixed query ``{hash join vector
    stream}``: one corpus-stats row (N, Σdl, per-term df), broadcast
    onto a zero-shuffle scoring projection, TakeOrderedAndProject
    top-k. Ordering is on the ROUNDED score (then doc_id) so both
    engines rank identically at the limit boundary."""
    d = load(spark, sf_dir, "documents")
    s = rt.bm25_scores(
        d, "doc_id", "text", list(BM25_TERMS), k1=BM25_K1, b=BM25_B
    )
    return (
        s.where(col("bm25") > 0)
        .orderBy(col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


def _bm25_oracle() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    dfs = ",\n                 ".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END)"
        f" AS DOUBLE) AS df{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    tfs = ",\n                 ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    k1, b, k1p1 = repr(BM25_K1), repr(BM25_B), repr(BM25_K1 + 1.0)
    terms = " + ".join(
        f"ln((s.nd - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        f" * (t.tf{i} * {k1p1})"
        f" / (t.tf{i} + {k1} * (1.0 - {b} + {b} * t.dld / (s.tdl / s.nd)))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
        WITH d AS (
          SELECT doc_id, {toks} AS toks, len({toks}) AS dl FROM documents
        ),
        s AS (
          SELECT CAST(count(*) AS DOUBLE) AS nd,
                 CAST(sum(dl) AS DOUBLE) AS tdl,
                 {dfs}
          FROM d
        ),
        t AS (
          SELECT doc_id, CAST(dl AS DOUBLE) AS dld,
                 {tfs}
          FROM d
        ),
        sc AS (
          SELECT t.doc_id, round(0.0 + {terms}, 6) + 0.0 AS bm25
          FROM t, s
        )
        SELECT doc_id, bm25 FROM sc
        WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """


# --------------------------------------------------------------------------
# MinHash estimate-vs-exact instrumentation
# --------------------------------------------------------------------------

def q_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality instrumentation for the MinHash path: every LSH
    candidate pair with its signature-estimated Jaccard (matching
    positions / k), the exact shingle Jaccard, and the absolute error.
    A signature/banding regression (bad seed, broken band slicing)
    shifts est away from exact and flips this row — the dedup analog of
    ``ivf_recall_at_k``. All-rational arithmetic, so the oracle matches
    bit-for-bit."""
    d = _with_near_dups(load(spark, sf_dir, "documents"), limit=100)
    shing = d.select(
        "doc_id", dd.word_shingles(col("text"), SHINGLE_N).alias("sh")
    ).localCheckpoint()
    sig = shing.select(
        "doc_id",
        "sh",
        dd.minhash_signature(col("sh"), MINHASH_K).alias("sig"),
    ).localCheckpoint()
    banded = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("_b"),
        "sig",
    ).select(
        "doc_id",
        F.concat(
            col("_b").cast("string"),
            F.lit(":"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(col("sig"), col("_b") * ROWS + r + 1)
                        for r in range(ROWS)
                    ],
                )
            ),
        ).alias("band_key"),
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (col("l.band_key") == col("r.band_key"))
            & (col("l.doc_id") < col("r.doc_id")),
        )
        .select(
            col("l.doc_id").alias("doc_a"), col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = sig.select(
        col("doc_id").alias("doc_a"),
        col("sh").alias("_sh_a"),
        col("sig").alias("_sig_a"),
    )
    b = sig.select(
        col("doc_id").alias("doc_b"),
        col("sh").alias("_sh_b"),
        col("sig").alias("_sig_b"),
    )
    est = F.round(
        F.aggregate(
            F.zip_with(
                col("_sig_a"),
                col("_sig_b"),
                lambda x, y: (x == y).cast("int"),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(float(MINHASH_K)),
        6,
    )
    exact = dd.jaccard(col("_sh_a"), col("_sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            exact.alias("jaccard_sim"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


def _minhash_est_oracle() -> str:
    jac = (
        "round(len(list_intersect(a.sh, b.sh)) * 1.0"
        " / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 4)"
    )
    est = (
        f"round(len(list_filter(generate_series(1, {MINHASH_K}),"
        f" i -> a.sig[i] = b.sig[i])) / {repr(float(MINHASH_K))}, 6)"
    )
    return f"""
        WITH unioned AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 100
          UNION ALL
          SELECT doc_id + {DUP_OFFSET},
                 substring(text, instr(text, ' ') + 1)
          FROM documents WHERE doc_id < 100
        ),
        sh AS (SELECT doc_id, {_dk_shingles()} AS sh FROM unioned),
        sig AS (SELECT doc_id, sh, {_dk_minhash_sig()} AS sig FROM sh),
        banded AS (
          SELECT doc_id, unnest({_dk_band_keys()}) AS band_key FROM sig
        ),
        pairs AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM banded l JOIN banded r
            ON l.band_key = r.band_key AND l.doc_id < r.doc_id
        ),
        j AS (
          SELECT p.doc_a, p.doc_b, {est} AS est_jaccard, {jac} AS jaccard_sim
          FROM pairs p
          JOIN sig a ON p.doc_a = a.doc_id
          JOIN sig b ON p.doc_b = b.doc_id
        )
        SELECT doc_a, doc_b, est_jaccard, jaccard_sim,
               round(abs(est_jaccard - jaccard_sim), 6) AS abs_err
        FROM j
    """


# --------------------------------------------------------------------------
# Exact percentiles
# --------------------------------------------------------------------------

def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark ``percentile`` ≡
    SQL ``percentile_cont``, Hyndman-Fan type 7) of extended price per
    return flag — the order-statistic battery. Deterministic regardless
    of aggregation order (an order statistic, not a float sum)."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [
        (
            F.round(
                F.percentile(col("l_extendedprice"), F.lit(p)), 6
            )
            + F.lit(0.0)
        ).alias(f"price_p{int(p * 100)}")
        for p in _PCTS
    ]
    return (
        li.groupBy("l_returnflag")
        .agg(*aggs, F.count(F.lit(1)).alias("n_rows"))
        .orderBy("l_returnflag")
    )


def _percentile_oracle() -> str:
    cols = ",\n               ".join(
        f"round(quantile_cont(l_extendedprice, {repr(p)}), 6) + 0.0"
        f" AS price_p{int(p * 100)}"
        for p in _PCTS
    )
    return f"""
        SELECT l_returnflag,
               {cols},
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """


# --------------------------------------------------------------------------
# SCD-2 validity intervals
# --------------------------------------------------------------------------

def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from the event stream:
    collapse each user's consecutive same-``event_type`` runs into
    validity intervals ``[valid_from, valid_to)`` with version numbers
    and a current flag — the change-data-capture shape a MERGE-fed
    dimension table holds. Two windows + one groupBy, all keyed on
    ``user_id`` (one shuffle; the windows reuse the partitioning)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(
        prev.isNull() | (prev != col("event_type")), 1
    ).otherwise(0)
    runs = e.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg).over(w).alias("_grp"),
    )
    g = runs.groupBy("user_id", "_grp").agg(
        F.min("ts").alias("valid_from"),
        F.min("event_type").alias("event_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "_grp")
    nxt = F.lead("valid_from").over(w2)
    return g.select(
        "user_id",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
        "n_events",
    )


def _scd2_oracle() -> str:
    return """
        WITH r AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                      OR lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        <> event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events
        ),
        runs AS (
          SELECT user_id, ts, event_type,
                 sum(chg) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS grp
          FROM r
        ),
        g AS (
          SELECT user_id, grp, min(ts) AS valid_from,
                 min(event_type) AS event_type, count(*) AS n_events
          FROM runs GROUP BY user_id, grp
        )
        SELECT user_id, event_type, valid_from,
               lead(valid_from) OVER w AS valid_to,
               lead(valid_from) OVER w IS NULL AS is_current,
               row_number() OVER w AS version,
               n_events
        FROM g
        WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, grp)
    """


QUERIES = {
    "dsir_importance": q_dsir_importance,
    "bm25_topk": q_bm25_topk,
    "minhash_est_error": q_minhash_est_error,
    "percentile_agg": q_percentile_agg,
    "scd2_intervals": q_scd2_intervals,
}

ORACLE = {
    "dsir_importance": _dsir_oracle(),
    "bm25_topk": _bm25_oracle(),
    "minhash_est_error": _minhash_est_oracle(),
    "percentile_agg": _percentile_oracle(),
    "scd2_intervals": _scd2_oracle(),
}
