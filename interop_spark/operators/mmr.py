"""Maximal Marginal Relevance diversity rerank (round-15b; public
method: Carbonell & Goldstein, SIGIR 1998). Registered driver row
since r16 (`queries/corpus_ext.py:mmr_rerank`).

MMR picks k results that are RELEVANT to the query but DIVERSE among
themselves: after seeding with the most relevant candidate, each step
picks argmax over remaining candidates of

    lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)

— the selection step every retrieval-augmented pipeline runs on its
ANN shortlist so near-duplicate passages don't crowd out coverage.

Determinism contract: every similarity is quantized ppb-integer as
``floor(cosine * 1e9)`` — floor of a double is exact and
engine-identical (unlike round-half, whose half-case semantics differ
between Spark/DuckDB/Python), and lambda is carried as an integer
num/den pair, so the greedy compares INTEGERS with an id tie-break.
The pairwise similarities themselves are computed in Spark SQL (the
same expression family the oracle's DuckDB macros replay), never in
Python floats.

Scale shape: the distributed work is one corpus scan for the relevance
top-``shortlist`` (TakeOrderedAndProject boundary — the ANN shortlist;
compose with `ivf_probe_topk` at 100 TB) plus a shortlist x shortlist
broadcast self-join for the pairwise matrix (32x32 = bounded). Only
the INTEGER similarity matrix is collected — the model-artifact-sized
collect the kmeans/PQ-codebook paths already use — and the greedy runs
over <= shortlist*k integer comparisons on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

MMR_SHORTLIST = 32
MMR_K = 8
MMR_LAM_NUM = 7  # lambda = 0.7
MMR_LAM_DEN = 10
PPB = 1_000_000_000


def _cos_ppb(a, b):
    """floor(cosine(a, b) * 1e9) as BIGINT — exact on doubles, so both
    engines derive the identical integer from the identical double."""
    from interop_spark.operators.similarity import cosine_sim

    return F.floor(cosine_sim(a, b) * F.lit(float(PPB))).cast("bigint")


def mmr_rerank(
    emb_df: DataFrame,
    query_vec: list[float],
    k: int = MMR_K,
    shortlist: int = MMR_SHORTLIST,
    lam_num: int = MMR_LAM_NUM,
    lam_den: int = MMR_LAM_DEN,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MMR-rerank the ``shortlist`` most query-relevant vectors down to
    ``k`` diverse picks. Returns (rank, id, rel_ppb, div_ppb,
    score_scaled): ``div_ppb`` is the picked item's max similarity to
    the previously selected set at pick time (NULL-as--2e9 never occurs
    in output — the seed's div_ppb is 0 by convention), ``score_scaled``
    the integer ``lam_num*rel - (lam_den-lam_num)*div`` it won with."""
    from interop_spark.operators.similarity import (
        as_double,
        query_cosine_udf,
    )

    spark = emb_df.sparkSession
    sl = (
        emb_df.select(
            col(id_col).alias("id"),
            as_double(col(vec_col)).alias("v"),
        )
        # Arrow-vectorized relevance pass (r20, guide §4): floor-ppb of
        # the left-to-right cosine — floor is exact on doubles, so the
        # integer is bit-identical to the _cos_ppb fold (pinned by
        # test_query_cosine_udf_bitexact); the bounded pairwise matrix
        # below keeps the fold (32x32 rows, not worth a Python pass)
        .withColumn("rel_ppb", query_cosine_udf(query_vec, ppb=PPB)(col("v")))
        # a NULL embedding (or null elements) yields NULL rel_ppb; drop
        # those rows BEFORE the shortlist so rel[c] is never None in the
        # driver greedy (ADVICE r15)
        .where(col("rel_ppb").isNotNull())
        .orderBy(col("rel_ppb").desc(), "id")
        .limit(shortlist)
        .localCheckpoint()  # bounded by construction; feeds 2 branches
    )
    a = sl.select(col("id").alias("ia"), col("v").alias("va"))
    b = sl.select(col("id").alias("ib"), col("v").alias("vb"))
    pair_rows = (
        a.join(F.broadcast(b), col("ia") < col("ib"))
        .select(
            "ia", "ib", _cos_ppb(col("va"), col("vb")).alias("sim_ppb")
        )
        .collect()
    )
    rel = {
        r["id"]: r["rel_ppb"] for r in sl.select("id", "rel_ppb").collect()
    }
    sim: dict = {}
    for r in pair_rows:
        sim[(r["ia"], r["ib"])] = r["sim_ppb"]
        sim[(r["ib"], r["ia"])] = r["sim_ppb"]

    remaining = set(rel)
    picks = []
    selected: list = []
    for rank in range(1, min(k, len(rel)) + 1):
        best = None
        for c in remaining:
            div = max((sim[(c, s)] for s in selected), default=0)
            score = lam_num * rel[c] - (lam_den - lam_num) * div
            # maximize score, tie-break on SMALLEST id; compare the id
            # directly (no negation) so any orderable id type works
            # (ADVICE r15)
            if (
                best is None
                or score > best[0]
                or (score == best[0] and c < best[1])
            ):
                best = (score, c, div)
        score, cid, div = best
        picks.append((rank, cid, rel[cid], div, score))
        selected.append(cid)
        remaining.discard(cid)
    id_type = dict(emb_df.dtypes)[id_col]  # works for any orderable id
    if not picks:
        return spark.createDataFrame(
            [],
            f"rank int, id {id_type}, rel_ppb long, div_ppb long,"
            " score_scaled long",
        )
    # JVM-side literal explode (the repo's pair-panel pattern): a
    # Python-backed createDataFrame source costs a Python worker
    # round-trip per downstream reference (r19 optimization round)
    rows = F.array(
        *[
            F.struct(
                F.lit(rk).cast("int").alias("rank"),
                F.lit(cid).cast(id_type).alias("id"),
                F.lit(rel_).cast("long").alias("rel_ppb"),
                F.lit(div_).cast("long").alias("div_ppb"),
                F.lit(sc_).cast("long").alias("score_scaled"),
            )
            for (rk, cid, rel_, div_, sc_) in picks
        ]
    )
    out = (
        spark.range(1)
        .select(F.explode(rows).alias("_p"))
        .select("_p.rank", "_p.id", "_p.rel_ppb", "_p.div_ppb",
                "_p.score_scaled")
    )
    return out.orderBy("rank")
