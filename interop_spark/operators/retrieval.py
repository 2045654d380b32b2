"""Data-selection and lexical-retrieval operators: DSIR importance
weighting (Xie et al., "Data Selection via Importance Resampling",
NeurIPS 2023 — public) and BM25 ranking (Robertson & Zaragoza 2009 —
public). Complements the reference's corpus operators (the reference's
notebook pipeline stops at ingest + SQL analytics,
`01_dbignite_sample.py:229-319`; selection/retrieval are engine
extensions a training-data pipeline needs).

Scale notes
-----------
- DSIR fit is a hashed-bigram bucket count: one explode + one groupBy
  over ``n_buckets`` keys (256 here; 10k in the paper). The bucket
  table is tiny by construction, so collecting it to the driver and
  re-embedding the log-ratio vector as a literal is the same
  "broadcast the model" move a 100 TB run makes (identical to the
  kmeans/PQ codebook pattern). The scoring pass is then a zero-shuffle
  row-local fold — scan-bandwidth bound.
- BM25 here is the scan-scoring form: corpus stats (N, avgdl, per-term
  df) reduce to ONE broadcast row, and each document scores itself in
  a single projection — right for a fixed small query set. A
  high-QPS / large-vocabulary deployment would instead materialize an
  inverted index (explode tokens → (term, doc, tf) table, bucketed by
  term) and equi-join the query terms against it; both shapes avoid
  any per-document driver work.

Cross-engine determinism: scores use only IEEE-exact ops (integer
counts widened to double, correctly-rounded divisions) plus ``ln`` of
those values, folded in a FIXED order (array order for DSIR, term
order for BM25), so Spark and the DuckDB oracle agree to well under
the round-6 hash tolerance (same argument as
``operators/text.token_entropy``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from interop_spark.operators import text as tx

DSIR_BUCKETS = 256


def dsir_fit_logratios(
    df: DataFrame,
    text_col: str,
    target_col: str,
    n_buckets: int = DSIR_BUCKETS,
) -> list:
    """Fit the DSIR bucket log-likelihood-ratio vector.

    Hashed word-bigram features (the paper's hashed n-gram generative
    model, §3.2): bucket counts on the target side (``target_col`` true)
    and the raw side, add-one smoothed, as
    ``λ[b] = ln tc[b] − ln rc[b] − ln Σtc + ln Σrc`` — the per-feature
    log importance weight. Returns a plain Python list (the "model") for
    :func:`dsir_logratio` to embed as a literal.
    """
    g = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(target_col).alias("_t"),
            F.explode(tx.word_ngrams(F.col(text_col), 2)).alias("_g"),
        )
        .select("_t", tx.token_bucket(F.col("_g"), n_buckets).alias("_b"))
        .groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("tc"),
            F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("rc"),
        )
    )
    tc = [1] * n_buckets
    rc = [1] * n_buckets
    for r in g.collect():
        tc[r["_b"]] += r["tc"]
        rc[r["_b"]] += r["rc"]
    lt, lr = math.log(sum(tc)), math.log(sum(rc))
    return [
        math.log(tc[b]) - math.log(rc[b]) - lt + lr for b in range(n_buckets)
    ]


def dsir_logratio(text: Column, logratios: list) -> Column:
    """Per-document DSIR log importance weight: Σ over the doc's hashed
    bigrams of the fitted bucket log-ratio, folded in bigram order
    (deterministic double summation). NULL text → NULL (explicitly
    gated: ``word_ngrams`` on NULL would otherwise collapse to the
    one-empty-gram path via ``greatest(NULL, 1)`` and score the
    empty-string bucket). UNROUNDED — oracle-facing callers round +
    signed-zero-normalize."""
    n = len(logratios)
    lam = F.array(*[F.lit(float(v)) for v in logratios])
    return F.when(
        text.isNotNull(),
        F.aggregate(
            tx.word_ngrams(text, 2),
            F.lit(0.0),
            lambda acc, g: acc
            + F.element_at(lam, (tx.token_bucket(g, n) + 1).cast("int")),
        ),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document against a fixed term list.

    Okapi BM25 (Robertson & Zaragoza 2009):
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` with
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``.

    Plan shape: one tiny aggregate produces the single corpus-stats row
    (N, Σdl, per-term df — each df a conditional sum in the SAME pass);
    a broadcast cross-join attaches it and every document scores itself
    in one zero-shuffle projection. Returns (id, bm25 rounded to 6,
    signed-zero-normalized) for ALL documents; callers filter/top-k.

    NULL-text rows are excluded up front (from the corpus stats AND the
    scoring scan): under non-ANSI Spark ``size(tokens(NULL))`` is -1,
    which would skew Σdl/avgdl and emit tf = -1 garbage while a SQL
    oracle's NULL-skipping ``sum`` silently diverges — the known
    fixture-drift class guarded identically in ``chunk_sliding`` and
    ``dsir_logratio``.
    """
    toks = tx.tokens(F.col(text_col))
    d = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("_dl"),
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_tdl"),
        *[
            F.sum(F.array_contains("_toks", t).cast("int")).alias(f"_df{i}")
            for i, t in enumerate(terms)
        ],
    )
    nd = F.col("_n").cast("double")
    avgdl = F.col("_tdl").cast("double") / nd
    dl = F.col("_dl").cast("double")
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dfi = F.col(f"_df{i}").cast("double")
        idf = F.log(
            (nd - dfi + F.lit(0.5)) / (dfi + F.lit(0.5)) + F.lit(1.0)
        )
        tf = F.size(
            F.filter(F.col("_toks"), lambda x: x == F.lit(t))
        ).cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / denom
    return d.crossJoin(F.broadcast(stats)).select(
        id_col, (F.round(score, 6) + F.lit(0.0)).alias("bm25")
    )
