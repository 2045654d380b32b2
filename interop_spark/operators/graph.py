"""Link-graph operators for corpus quality weighting.

Web-scale pretraining pipelines weight or filter pages by link-graph
centrality (the Common Crawl ranking family — Brin & Page, "The anatomy
of a large-scale hypertextual Web search engine", 1998; harmonic/PageRank
host ranks ship with every CC release). The engine version is PageRank
over an edge DataFrame with EXACT INTEGER arithmetic so every engine
reproduces the ranks bit-for-bit: ranks are parts-per-million integers,
each out-edge carries ``(rank * damping_num) div (damping_den * outdeg)``
(floor division), and the per-node combine is an integer SUM — associative
and order-independent, unlike float addition, which would make the result
depend on Spark's partial-aggregation order.

Scale shape
-----------
One iteration = one equi-join (ranks onto edge sources) + one keyed SUM
(by destination) + one left join back onto the node list for
zero-indegree nodes — all standard shuffles on uniformly distributed id
keys. State between iterations is a (node, rank) frame, never a driver
structure; K iterations are K chained shuffles, exactly the Pregel
dataflow without per-node message loops. Skewed in-degree (a hub page)
concentrates one SUM key — AQE skew-split handles it because the combine
is a plain aggregate, not a collect_list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank scale (parts-per-million) and the classic 0.85 damping as a
# rational: new_rank = BASE_PPM*(1-d) + Σ incoming (rank*85) div (100*out)
RANK_PPM = 1_000_000
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer PageRank: ``iterations`` exact-arithmetic iterations over
    ``edges`` (``src``, ``dst``, ``outdeg`` — the source's TOTAL
    out-degree, precomputed so the per-edge share needs no second
    aggregate per iteration). Returns (node, rank) with rank in ppm.

    Every node starts at ``RANK_PPM``; each iteration a node keeps the
    teleport share ``RANK_PPM*(DAMP_DEN-DAMP_NUM)/DAMP_DEN`` and gains
    ``(rank_src*DAMP_NUM) div (DAMP_DEN*outdeg)`` per in-edge. Floor
    division loses < 1 ppm per edge — the price of cross-engine
    bit-exactness (float PageRank differs run-to-run under Spark's
    partial-agg order, which is unacceptable for a driver-checked gate).
    """
    teleport = RANK_PPM * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ranks = nodes.select(
        F.col(node_col).alias("_n"), F.lit(RANK_PPM).cast("long").alias("_r")
    )
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        F.col("outdeg").alias("_out"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["_src"] == ranks["_n"])
            .select(
                "_dst",
                F.expr(f"_r * {DAMP_NUM} div ({DAMP_DEN} * _out)").alias(
                    "_c"
                ),
            )
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.select(F.col(node_col).alias("_n"))
            .join(contrib, F.col("_n") == contrib["_dst"], "left")
            .select(
                "_n",
                (
                    F.lit(teleport) + F.coalesce(F.col("_in"), F.lit(0))
                ).cast("long").alias("_r"),
            )
        )
    return ranks.select(
        F.col("_n").alias(node_col), F.col("_r").alias("rank_ppm")
    )
