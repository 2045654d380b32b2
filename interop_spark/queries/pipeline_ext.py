"""Round-4 pipeline-operator promotions (new module so `pipeline.py` —
and therefore its 24 out-of-window round-3-green queries — stays
untouched; see the window invariant note in ``queries/__init__``).

Promotes the two round-3 "weak" components into the driver's oracle gate
(`gopher_quality_flags`, the ``IVFIndex`` build-once/search-many API) and
adds the k-means training step (`kmeans_one_step`, the oracle twin of
``operators/kmeans.py``'s Lloyd update).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load
from interop_spark.operators import text as tx
from interop_spark.queries.pipeline import (
    EMB_DIM,
    N_CENTROIDS,
    _dk_dot,
    _dk_norm,
    _TOKENS,
)

KM_K = N_CENTROIDS  # one Lloyd step trains the same 8 coarse centroids


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.1 keep/drop signals, flattened to scalar columns — ONE
    projection pass over the corpus computes every signal plus the
    composite ``keep`` (round-4: the gate now includes the published
    dup-line repetition threshold)."""
    d = load(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(col("text"))
    return d.withColumn("_g", g).select(
        "doc_id",
        col("_g.n_words").alias("n_words"),
        col("_g.mean_word_len").alias("mean_word_len"),
        col("_g.symbol_word_ratio").alias("symbol_word_ratio"),
        col("_g.alpha_word_ratio").alias("alpha_word_ratio"),
        col("_g.bullet_ratio").alias("bullet_ratio"),
        col("_g.ellipsis_ratio").alias("ellipsis_ratio"),
        col("_g.dup_line_ratio").alias("dup_line_ratio"),
        col("_g.keep").alias("keep"),
    )


def q_ivf_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``IVFIndex`` build-once/search-many API as a driver query:
    build over the embeddings corpus (first-C centroids), then search the
    vec_id=1 vector with nprobe=2 — exercises the materialized-assignment
    reuse path that `ivf_probe_topk` (which inlines the build) does not."""
    from interop_spark.operators.similarity import ivf_build

    e = load(spark, sf_dir, "embeddings")
    cent = e.where(col("vec_id") < N_CENTROIDS).select(
        col("vec_id").alias("centroid_id"), col("embedding").alias("centroid")
    )
    index = ivf_build(e, cent)
    qvec = [
        float(x)
        for x in e.where(col("vec_id") == 1).select("embedding").collect()[0][0]
    ]
    return index.search(qvec, k=5, nprobe=2)


def q_kmeans_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration (assign → per-cell component means) with the
    deterministic first-k seeding, posexploded to (centroid_id, dim,
    comp) rows so the 64-dim centroid arrays get a full value-hash
    oracle. comp is the operator's 9-decimal component re-rounded to 4
    for cross-engine mean stability, then ``+ 0.0`` to normalize signed
    zero — a mean like -0.000044 rounds to -0.0 in DuckDB but +0.0 in
    Spark, and the driver's value hash distinguishes them (the round-4
    failure); IEEE -0.0 + 0.0 = +0.0 collapses both engines to the same
    bits."""
    from interop_spark.operators.kmeans import kmeans_init, kmeans_one_step

    e = load(spark, sf_dir, "embeddings")
    cents = kmeans_one_step(e, kmeans_init(e, KM_K))
    return cents.select(
        "centroid_id", F.posexplode("centroid").alias("pos", "c")
    ).select(
        "centroid_id",
        (col("pos") + 1).alias("dim"),
        (F.round(col("c"), 4) + F.lit(0.0)).alias("comp"),
    )


QUERIES = {
    "gopher_quality_flags": q_gopher_quality_flags,
    "ivf_index_search": q_ivf_index_search,
    "kmeans_one_step": q_kmeans_one_step,
}


ORACLE = {
    "gopher_quality_flags": f"""
        WITH t AS (
          SELECT doc_id, text, {_TOKENS} AS toks,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ),
        s AS (
          SELECT doc_id,
                 CAST(len(toks) AS INTEGER) AS n_words,
                 round(list_sum(list_transform(toks, w -> len(w)))
                       / greatest(len(toks), 1), 4) AS mean_word_len,
                 round((length(text) - length(replace(text, '#', ''))
                        + len(regexp_extract_all(text, '(\\.\\.\\.|…)')))
                       * 1.0 / greatest(len(toks), 1), 4)
                   AS symbol_word_ratio,
                 round(len(list_filter(toks,
                           w -> regexp_matches(w, '[A-Za-z]')))
                       * 1.0 / greatest(len(toks), 1), 4)
                   AS alpha_word_ratio,
                 round(len(list_filter(lines,
                           l -> regexp_matches(l, '^\\s*([-*•])')))
                       * 1.0 / greatest(len(lines), 1), 4) AS bullet_ratio,
                 round(len(list_filter(lines,
                           l -> regexp_matches(l, '(\\.\\.\\.|…)$')))
                       * 1.0 / greatest(len(lines), 1), 4)
                   AS ellipsis_ratio,
                 round((len(lines) - len(list_distinct(lines)))
                       * 1.0 / greatest(len(lines), 1), 4) AS dup_line_ratio
          FROM t
        )
        SELECT *,
               (n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3 AND 10
                AND symbol_word_ratio < 0.1
                AND alpha_word_ratio >= 0.8
                AND bullet_ratio < 0.9
                AND ellipsis_ratio < 0.3
                AND dup_line_ratio <= 0.30) AS keep
        FROM s
    """,
    "ivf_index_search": f"""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid
          FROM embeddings WHERE vec_id < {N_CENTROIDS}
        ),
        sims AS (
          SELECT e.vec_id, c.centroid_id,
                 round({_dk_dot('e.embedding', 'c.centroid')}
                       / greatest({_dk_norm('e.embedding')}
                                  * {_dk_norm('c.centroid')}, 1e-12), 9) AS v
          FROM embeddings e, cent c
        ),
        cells AS (
          SELECT vec_id, (max({{'v': v, 'k': centroid_id}})).k AS cell
          FROM sims GROUP BY vec_id
        ),
        qcells AS (
          SELECT centroid_id FROM sims WHERE vec_id = 1
          ORDER BY v DESC, centroid_id DESC LIMIT 2
        ),
        q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 1)
        SELECT c.vec_id, c.cell,
               round({_dk_dot('e.embedding', 'qvec')}
                     / greatest({_dk_norm('e.embedding')} * {_dk_norm('qvec')},
                                1e-12), 6) AS cosine_sim
        FROM cells c
        JOIN embeddings e ON c.vec_id = e.vec_id
        CROSS JOIN q
        WHERE c.cell IN (SELECT centroid_id FROM qcells)
        ORDER BY cosine_sim DESC, c.vec_id ASC LIMIT 5
    """,
    "kmeans_one_step": f"""
        WITH cent AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id,
                 embedding AS centroid
          FROM embeddings ORDER BY vec_id LIMIT {KM_K}
        ),
        sims AS (
          SELECT e.vec_id, c.centroid_id,
                 round({_dk_dot('e.embedding', 'c.centroid')}
                       / greatest({_dk_norm('e.embedding')}
                                  * {_dk_norm('c.centroid')}, 1e-12), 9) AS v
          FROM embeddings e, cent c
        ),
        cells AS (
          SELECT vec_id, (max({{'v': v, 'k': centroid_id}})).k AS cell
          FROM sims GROUP BY vec_id
        )
        SELECT cells.cell AS centroid_id,
               g.i AS dim,
               round(round(avg(CAST(e.embedding[g.i] AS DOUBLE)), 9), 4) + 0.0
                 AS comp
        FROM cells
        JOIN embeddings e ON cells.vec_id = e.vec_id
        CROSS JOIN generate_series(1, {EMB_DIM}) AS g(i)
        GROUP BY cells.cell, g.i
    """,
}
