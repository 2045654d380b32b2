"""N-gram language-model scoring for corpus quality filtering — the
CCNet shape (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", 2020 — public), which scores web text
with an LM trained on a trusted reference corpus and filters on
perplexity. The production original uses a KenLM 5-gram model
(Heafield 2011); the engine version trains an add-one-smoothed bigram
LM with the same train-on-reference / score-everything split.

Scale shape
-----------
Training = one explode + keyed count per n-gram order — the LM "model"
is a (prev, word) → count TABLE, not a driver-side object, because a
real reference vocabulary does not fit an executor literal. Scoring =
explode the candidate corpus's bigrams, two LEFT equi-joins against
the count tables (Spark broadcasts them when small; shuffles on the
gram key when not — either way no driver materialization), and one
per-doc aggregate. This is the honest 100 TB plan: every stage is a
keyed join/agg on uniformly-hashed string keys.

Determinism: counts are integers, probabilities are single
correctly-rounded divisions, ``ln`` is the only libm op, and per-doc
aggregation rounds to 6 — same cross-engine argument as
``text.token_entropy``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from interop_spark.operators import text as tx


def token_pairs(text: Column) -> Column:
    """Adjacent token pairs as (p, w) structs; NULL for docs with fewer
    than two tokens (explode then yields no rows — short docs simply
    have no bigram evidence)."""
    t = tx.tokens(text)
    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("p"),
                F.element_at(t, i + 1).alias("w"),
            ),
        ),
    )


def bigram_lm_tables(
    ref: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the add-one bigram LM on the reference corpus: returns
    (unigram counts ``(p, cu)``, bigram counts ``(p, w, cb)``, one-row
    vocab size ``(v)`` = distinct reference tokens + 1 for OOV)."""
    toks = ref.select(
        F.explode(tx.tokens(F.col(text_col))).alias("w")
    )
    uni = toks.groupBy(F.col("w").alias("p")).agg(
        F.count(F.lit(1)).alias("cu")
    )
    big = (
        ref.select(F.explode(token_pairs(F.col(text_col))).alias("pr"))
        .groupBy(
            F.col("pr.p").alias("p"), F.col("pr.w").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    vocab = uni.agg((F.count(F.lit(1)) + F.lit(1)).alias("v"))
    return uni, big, vocab


def score_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    big: DataFrame,
    vocab: DataFrame,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the bigram LM:
    ``−(1/n) Σ ln((cb+1)/(cu+V))`` over the doc's adjacent pairs
    (lower = more reference-like; CCNet's head/middle/tail split
    thresholds exactly this quantity). Docs with <2 tokens have no
    bigram evidence and return NULL. Unrounded columns are not exposed —
    ``avg_nll`` is rounded to 6 and signed-zero-normalized."""
    pairs = df.select(
        F.col(id_col).alias(id_col),
        F.explode(token_pairs(F.col(text_col))).alias("pr"),
    ).select(id_col, F.col("pr.p").alias("p"), F.col("pr.w").alias("w"))
    joined = (
        pairs.join(big, ["p", "w"], "left")
        .join(uni, ["p"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    lnp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v")).cast("double")
    )
    scored = joined.groupBy(id_col).agg(
        (F.round(-F.avg(lnp), 6) + F.lit(0.0)).alias("avg_nll"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    return (
        df.select(id_col)
        .join(scored, [id_col], "left")
        .select(
            id_col,
            "avg_nll",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        )
    )
