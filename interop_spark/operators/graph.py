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


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via DEGREE ORIENTATION (the classic
    MapReduce/GraphX algorithm): canonicalize to simple undirected
    edges, orient every edge from its lower-(degree, id) endpoint to
    the higher, and count directed 2-paths closed by a third oriented
    edge. Each triangle is counted exactly once, and orientation
    bounds every node's out-degree by O(sqrt(|E|)) — the wedge join's
    output is O(|E|^{3/2}) instead of the naive sum of deg² — which is
    what makes the two equi-joins survive a power-law graph at scale.

    Input may contain duplicates and self-loops; both are dropped.
    Returns a 1-row frame (n_nodes, n_edges, n_triangles), all exact
    integers.
    """
    # the canonical edge frame is referenced four times below (degree
    # build x2, the orientation join, the edge count) — checkpoint it
    # so the distinct shuffle runs once (r19 optimization round; the
    # edge-frame materialization every distributed-graph algorithm
    # stages anyway)
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    # orient low (deg, id) -> high (deg, id); the tuple order is total
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # oriented feeds both wedge legs AND the closing join — checkpoint
    # so the two degree joins run once, not three times (r19)
    oriented = withdeg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint()
    e1 = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y"), F.col("db").alias("dy")
    )
    e2 = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("z"), F.col("db").alias("dz")
    )
    # wedge endpoints ordered by the SAME (deg, id) total order the
    # orientation uses, so the closing edge is exactly the oriented
    # y->z — a plain two-column EQUI-join (an OR-of-directions
    # predicate here would plan as a nested loop)
    wedges = e1.join(e2, "x").where(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closed = wedges.join(
        oriented.select(F.col("a").alias("y"), F.col("b").alias("z")),
        ["y", "z"],
    )
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_e = und.agg(F.count(F.lit(1)).alias("n_edges"))
    n_n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        n_n.crossJoin(F.broadcast(n_e))
        .crossJoin(F.broadcast(n_tri))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )
