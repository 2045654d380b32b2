"""Product quantization (PQ) — the ANN compression rung after int8
scalar quantization (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; public algorithm).

A d-dim vector splits into M contiguous subvectors of d/M dims; each
subspace trains a small k-codeword codebook (Lloyd iterations under L2 —
the classic PQ objective; L2 decomposes exactly across subspaces:
``||x - y||² = Σ_m ||x_m - y_m||²``). A vector encodes as M small code
ids (M·log2(k) bits, e.g. 64 dims → 8 bytes at M=8, k=256), and
asymmetric distance computation (ADC) scores a query against encoded
vectors with M table lookups instead of d multiplies.

Spark-first shapes:

- **Training** treats the subspace index as a DATA dimension: each
  vector explodes into M ``(m, subvec)`` rows once, and every Lloyd
  iteration is ONE corpus scan + one ``(m, cell, pos)``-keyed aggregate
  that updates all M codebooks together (iters+1 scans total including
  the seed pass) — not M sequential per-subspace jobs.
- **Encoding** is a ZERO-shuffle projection: all M codebooks collapse
  into one literal/broadcast structure and each row takes M small
  argmin folds.
- **ADC search** precomputes the M×k query-to-codeword table
  DRIVER-side (M·k·(d/M) = d·k multiplies, microseconds), embeds it as
  a literal, and scores every encoded row with M ``element_at`` lookups
  — a pure projection followed by TakeOrderedAndProject for top-k.

``pq_encode``/``pq_adc_topk`` are driver-oracle queries
(``queries/pipeline_ext.py``); pytest additionally pins exactness of the
L2 decomposition, encode determinism, and recall sanity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.operators.similarity import as_double


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two arrays (double, left-to-right
    accumulation — the engine's cross-engine-reproducible fold shape)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def subvector(vec: Column, m: int, sub_dim: int) -> Column:
    """Subspace slice m (0-based) of width ``sub_dim``."""
    return F.slice(vec, m * sub_dim + 1, sub_dim)


def pq_train(
    df: DataFrame,
    m_subspaces: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks with Lloyd iterations under L2.

    Returns ``codebooks[m][c] = centroid (list of d/M floats)`` —
    deterministic (first-k seeding by lowest id, no RNG). The return is
    a plain Python structure because codebooks are tiny (M·k·(d/M) =
    d·k doubles) and become literals in encode/search plans.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by M={m_subspaces}")
    sub_dim = dim // m_subspaces
    # deterministic first-k seeding: the k lowest-id FULL vectors in one
    # bounded job, sliced into the M×k seed codewords driver-side —
    # identical seeds to slicing per subspace, at 1/M the scans.
    seeds = (
        df.select(col(id_col).alias("sid"), as_double(col(vec_col)).alias("v"))
        .orderBy("sid")
        .limit(k)
        .collect()
    )
    cbs: list[list[list[float]]] = [
        [
            [float(x) for x in r["v"][m * sub_dim : (m + 1) * sub_dim]]
            for r in seeds
        ]
        for m in range(m_subspaces)
    ]
    # subspace index as a data dimension: ONE Arrow-vectorized codes
    # pass per Lloyd iteration assigns all M subspaces at once
    # (pq_codes_udf — r20; the r19 shape exploded (m, sv) rows and paid
    # the interpreted argmin fold per subspace-row), then one
    # (m, cell, pos)-keyed aggregate updates all M codebooks together
    # (shuffle carries map-side combined partials, never raw vectors —
    # kmeans.centroid_update's shape, keyed by subspace as well as
    # cell). A NULL/wrong-dim vector yields NULL codes, and
    # posexplode(NULL) emits nothing — identical net contribution to
    # the r19 fold shape (NULL sv rows exploded to zero (pos, v) rows).
    for _ in range(iters):
        enc = df.select(
            as_double(col(vec_col)).alias("_v"),
            pq_codes_udf(cbs)(col(vec_col)).alias("_codes"),
        )
        rows = (
            enc.select(F.posexplode("_codes").alias("m", "cell"), "_v")
            .select(
                "m",
                "cell",
                F.posexplode(
                    F.expr(f"slice(_v, m * {sub_dim} + 1, {sub_dim})")
                ).alias("pos", "v"),
            )
            .groupBy("m", "cell", "pos")
            .agg(F.round(F.avg(col("v").cast("double")), 9).alias("mu"))
            .groupBy("m", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda s: s["mu"],
                ).alias("centroid")
            )
            .collect()
        )
        new = {
            (int(r["m"]), int(r["cell"])): [float(x) for x in r["centroid"]]
            for r in rows
        }
        # empty cells keep their previous codeword (standard practice).
        # Iterate the ACTUAL codebook length, not k: first-k seeding on a
        # corpus with fewer than k vectors yields a shorter seed list, and
        # assigned cells can only reference those existing codewords.
        cbs = [
            [new.get((m, c), cbs[m][c]) for c in range(len(cbs[m]))]
            for m in range(m_subspaces)
        ]
    return cbs


def _codebook_literal(cb_m: list[list[float]]) -> Column:
    # ONE F.expr parse instead of k·d py4j Column constructions — plan
    # construction was the dominant cost of every PQ query (r19; see
    # similarity.query_vector_literal). Bit-identical literals.
    import math

    from interop_spark.operators.similarity import matrix_literal_sql

    if all(math.isfinite(float(x)) for c in cb_m for x in c):
        return F.expr(matrix_literal_sql(cb_m))
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cb_m]
    )


def _table_literal(rows: list[list[float]]) -> Column:
    """2-D double-array literal, fast path (see _codebook_literal)."""
    import math

    from interop_spark.operators.similarity import matrix_literal_sql

    if all(math.isfinite(float(x)) for r in rows for x in r):
        return F.expr(matrix_literal_sql(rows))
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in r]) for r in rows]
    )


def pq_codes_udf(codebooks: list[list[list[float]]]):
    """Arrow-vectorized twin of the per-subspace ``_argmin_code`` folds:
    a ``pandas_udf`` mapping a full vector to its ``array<int>`` of M PQ
    codes in ONE ArrowEvalPython pass (r20 optimization round, guide §4
    — the interpreted ``F.aggregate`` folds were the family's dominant
    executor cost; numpy does the same arithmetic on whole batches).

    Bit-exactness contract (pinned by
    ``test_pq_codes_udf_bitexact_vs_fold``):

    - the squared-L2 accumulation runs LEFT-TO-RIGHT over dimensions
      (``acc += (x_j - c_j)^2`` per j, vectorized across rows) — the
      identical IEEE-754 double operation sequence as the ``l2sq``
      fold, so the unrounded distances are bit-identical;
    - round-9 replicates Spark's ``Round`` (BigDecimal HALF_UP on the
      shortest-repr decimal): a fast ``floor(x*1e9+0.5)`` path, with
      values within 1e-5 of a .5 boundary (where the scaled double
      could disagree with the decimal digits) re-rounded exactly via
      ``Decimal(repr(x))`` — Python's ``repr`` and Java's
      ``Double.toString`` both emit the unique shortest round-trip
      decimal, so the exact path IS Spark's rounding;
    - ``argmin`` takes the FIRST minimum — the fold's strict ``<`` keeps
      the lowest code id on rounded ties;
    - NULL/NaN distances never win (fold: NULL/NaN comparisons are
      false): NaNs are masked to +inf, an all-invalid row yields the
      fold's init code 0;
    - a NULL or wrong-dimension vector yields NULL codes (callers mask
      the same way ``pq_encode`` always has).

    The closure is SELF-CONTAINED (imports + helpers inside) so
    cloudpickle ships it by value — executors under a plain session
    have no ``interop_spark`` on sys.path."""
    from pyspark.sql.functions import pandas_udf

    cbs = [[[float(x) for x in cw] for cw in cb_m] for cb_m in codebooks]
    sub_dim = len(cbs[0][0])
    dim = sub_dim * len(cbs)

    @pandas_udf("array<int>")
    def _codes(s):
        import numpy as np
        import pandas as pd
        from decimal import ROUND_HALF_UP, Decimal

        q9 = Decimal("1E-9")

        def round9(a):
            scaled = a * 1e9
            fl = np.floor(scaled)
            out = np.where(np.isfinite(a), (fl + (scaled - fl >= 0.5)) / 1e9, a)
            risky = np.isfinite(a) & (np.abs(scaled - fl - 0.5) < 1e-5)
            if risky.any():
                flat, src = out.ravel(), a.ravel()
                for i in np.flatnonzero(risky.ravel()):
                    flat[i] = float(
                        Decimal(repr(float(src[i]))).quantize(
                            q9, rounding=ROUND_HALF_UP
                        )
                    )
            return out

        vals = list(s)
        out = [None] * len(vals)
        good = [
            i
            for i, v in enumerate(vals)
            if v is not None and len(v) == dim
        ]
        if good:
            X = np.asarray(
                [np.asarray(vals[i], dtype=np.float64) for i in good]
            )
            codes = np.empty((len(good), len(cbs)), dtype=np.int64)
            for m, cb_m in enumerate(cbs):
                Xm = X[:, m * sub_dim : (m + 1) * sub_dim]
                D = np.empty((len(cb_m), Xm.shape[0]))
                for c, cw in enumerate(cb_m):
                    acc = np.zeros(Xm.shape[0])
                    for j in range(sub_dim):
                        d = Xm[:, j] - cw[j]
                        acc = acc + d * d
                    D[c] = acc
                D = round9(D)
                D[np.isnan(D)] = np.inf
                codes[:, m] = np.argmin(D, axis=0)
            codes = codes.astype(np.int32)
            for row_i, i in enumerate(good):
                out[i] = codes[row_i]
        return pd.Series(out)

    return _codes


def _argmin_code_col(sv: Column, cb_col: Column) -> Column:
    """0-based code of the L2-nearest codeword in ``cb_col`` (an
    ``array<array<double>>`` Column) — a fold carrying (best_dist,
    best_idx, cur_idx); ties go to the LOWEST code id (strict <),
    deterministically. Since r20 this interpreted fold is the REFERENCE
    TWIN of the Arrow-vectorized ``pq_codes_udf`` (which the hot paths
    use); ``test_pq_codes_udf_bitexact_vs_fold`` pins their equality on
    the real fixtures. The distance is rounded to 9 decimals before
    comparison — the engine-wide argmin/argmax posture (same as
    ``ivf_assign``'s cosine): summation-order ULP differences between
    engines must not flip a near-tie."""
    init = F.struct(
        F.lit(float("inf")).alias("bd"),
        F.lit(0).alias("bi"),
        F.lit(0).alias("i"),
    )

    def _step(a, cw):
        d = F.round(l2sq(sv, cw), 9)
        better = d < a["bd"]
        return F.struct(
            F.when(better, d).otherwise(a["bd"]).alias("bd"),
            F.when(better, a["i"]).otherwise(a["bi"]).alias("bi"),
            (a["i"] + 1).alias("i"),
        )

    return F.aggregate(cb_col, init, _step, lambda a: a["bi"])


def _argmin_code(sv: Column, cb_m: list[list[float]]) -> Column:
    return _argmin_code_col(sv, _codebook_literal(cb_m))


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector as M code ids: ``(id[, *keep], codes
    array<int>)``. Pure projection — one Arrow-vectorized codes pass
    per row (``pq_codes_udf``; r20 — the r19 shape paid M interpreted
    argmin folds per row), zero shuffle. ``keep`` carries extra columns
    through (e.g. an IVF cell).

    A NULL or wrong-dimension vector yields NULL codes (the module's
    ``ivf_assign`` null contract) — enforced inside the UDF; without it
    such rows would silently encode as centroid 0 in every subspace,
    then outrank real neighbors in ADC search."""
    return df.select(
        col(id_col),
        *keep,
        pq_codes_udf(codebooks)(col(vec_col)).alias("codes"),
    )


def pq_adc_topk(
    encoded: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Asymmetric distance search: score = Σ_m table[m][code_m], where
    ``table[m][c] = ||q_m - codebook[m][c]||²`` is computed DRIVER-side
    (d·k multiplies) and embedded as a literal. Returns the k rows with
    smallest approximate squared L2 distance (``adc_dist``) —
    projection + TakeOrderedAndProject, no shuffle."""
    sub_dim = len(codebooks[0][0])
    table = [
        [
            sum(
                (query[m * sub_dim + j] - cw[j]) ** 2
                for j in range(sub_dim)
            )
            for cw in cb_m
        ]
        for m, cb_m in enumerate(codebooks)
    ]
    tbl = _table_literal(table)
    dist = F.round(
        F.aggregate(
            F.zip_with(
                col("codes"), tbl, lambda c, row: F.element_at(row, c + 1)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,  # round-9 before ranking: the top-k BOUNDARY must not
        #     depend on cross-engine summation-order ULPs (with the
        #     id tie-break below, the k-th row is then deterministic)
    )
    return (
        encoded.select(col(id_col), *keep, dist.alias("adc_dist"))
        .orderBy(col("adc_dist").asc(), col(id_col).asc())
        .limit(k)
    )


def ivfpq_search(
    df: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composed index search — the realistic 100 TB ANN layout:
    coarse IVF cells hold PQ codes, and a query ADC-scores only the
    rows in its ``nprobe`` nearest cells (Jégou et al. 2011 §V).

    Plan shape end-to-end: ``ivf_assign`` (one-row broadcast centroid
    array, no vector-side Exchange) → ``pq_encode`` projection carrying
    the cell through → broadcast one-row probe join filtering to the
    query's cells → literal-table ADC projection →
    TakeOrderedAndProject. Zero shuffles on the corpus side; on a
    cluster the encoded (cell, codes) table is the written index and a
    search touches ~nprobe/C of it via cell-partition pruning."""
    from interop_spark.operators.similarity import (
        centroid_array,
        ivf_assign,
        l2_norm,
        query_cells,
        query_vector_literal,
    )

    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    encoded = pq_encode(
        assigned, codebooks, id_col=id_col, vec_col=vec_col, keep=("cell",)
    )
    qv = query_vector_literal(query)
    qrow = centroid_array(centroids).select(
        query_cells(
            qv, col("_cents"), l2_norm(as_double(qv)), nprobe
        ).alias("_qcells")
    )
    probed = encoded.join(
        F.broadcast(qrow), F.array_contains(col("_qcells"), col("cell"))
    )
    return pq_adc_topk(
        probed, query, codebooks, k=k, id_col=id_col, keep=("cell",)
    )


def ivfpq_residual_search(
    df: DataFrame,
    centroids: DataFrame,
    query: list[float],
    m_subspaces: int = 4,
    k_codes: int = 16,
    iters: int = 1,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding (Jégou et al. 2011 §V.B — the
    production IVF-PQ): PQ codebooks train on ``x − centroid(cell)``
    rather than raw vectors, concentrating the quantizer's budget on
    the within-cell displacement, and ADC uses a PER-CELL distance
    table built from the query's residual against each probed cell.

    Plan shape mirrors ``ivfpq_search`` (broadcast assignment →
    zero-shuffle residual projection + encode → broadcast probe join →
    literal-table ADC → TakeOrderedAndProject) with one addition: the
    ADC table is a cell-keyed CASE chain over the (bounded, broadcast-
    able by contract) centroid set, so rows in different probed cells
    score against their own tables in the same projection."""
    from interop_spark.operators.similarity import (
        as_double,
        centroid_array,
        ivf_assign,
        l2_norm,
        query_cells,
        query_vector_literal,
    )

    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    cent = centroids.select(
        col("centroid_id").cast("bigint").alias("cell"),
        col("centroid").alias("_cvec"),
    )
    res = assigned.join(F.broadcast(cent), "cell").select(
        col(id_col),
        col("cell"),
        F.zip_with(
            as_double(col(vec_col)),
            as_double(col("_cvec")),
            lambda x, y: x - y,
        ).alias("_res"),
    )
    cbs = pq_train(
        res, m_subspaces, k_codes, iters, id_col=id_col, vec_col="_res",
        dim=dim,
    )
    encoded = pq_encode(res, cbs, id_col=id_col, vec_col="_res", keep=("cell",))
    qv = query_vector_literal(query)
    qrow = centroid_array(centroids).select(
        query_cells(
            qv, col("_cents"), l2_norm(as_double(qv)), nprobe
        ).alias("_qcells")
    )
    probed = encoded.join(
        F.broadcast(qrow), F.array_contains(col("_qcells"), col("cell"))
    )
    # per-cell ADC tables, driver-side (C·d·k multiplies — the same
    # bounded-centroid contract as the codebook literals)
    cent_vecs = {
        int(r[0]): [float(x) for x in r[1]]
        for r in centroids.select("centroid_id", "centroid").collect()
    }
    sub = len(cbs[0][0])

    def _table(cell: int) -> list[list[float]]:
        qres = [query[i] - cent_vecs[cell][i] for i in range(len(query))]
        return [
            [
                sum(
                    (qres[m * sub + j] - cw[j]) ** 2 for j in range(sub)
                )
                for cw in cb_m
            ]
            for m, cb_m in enumerate(cbs)
        ]

    tbl = None
    for cell in sorted(cent_vecs):
        lit = _table_literal(_table(cell))
        cond = col("cell") == F.lit(cell)
        tbl = F.when(cond, lit) if tbl is None else tbl.when(cond, lit)
    dist = F.round(
        F.aggregate(
            F.zip_with(
                col("codes"), tbl, lambda c, row: F.element_at(row, c + 1)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    return (
        probed.select(col(id_col), col("cell"), dist.alias("adc_dist"))
        .orderBy(col("adc_dist").asc(), col(id_col).asc())
        .limit(k)
    )


def ivfpq_rerank(
    df: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    shortlist: int | None = None,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval with EXACT refinement — the FAISS
    ``IndexRefineFlat`` shape and the standard production recipe for
    recovering recall lost to PQ compression: (1) ``ivfpq_search``
    produces a compressed-domain ADC shortlist of ``shortlist``
    (default 3k) candidates, (2) only those candidates' RAW vectors are
    re-scored with exact squared L2 and the final top-k is ordered by
    the exact distance (round-9, id tiebreak — the engine's
    cross-engine posture).

    Plan shape: stage 1 is the zero-corpus-shuffle ivfpq chain; stage 2
    broadcasts the ≤``shortlist``-row candidate table against the
    vector source, so the refinement is a broadcast-semi-join + one
    projection — never a second ranking pass over the corpus. At
    100 TB the raw-vector fetch is a point-lookup join against the
    id-bucketed vector table; candidate count is a constant.

    Returns ``(id, cell, adc_dist, exact_dist)`` — keeping the ADC
    rank's distance alongside the exact one makes the refinement's
    reordering observable (and oracle-checkable)."""
    shortlist = 3 * k if shortlist is None else shortlist
    cand = ivfpq_search(
        df, centroids, codebooks, query,
        k=shortlist, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    )
    from interop_spark.operators.similarity import query_vector_literal

    qv = query_vector_literal(query)
    exact = F.round(l2sq(as_double(col(vec_col)), as_double(qv)), 9)
    return (
        df.join(F.broadcast(cand), id_col)
        .select(col(id_col), col("cell"), col("adc_dist"),
                exact.alias("exact_dist"))
        .orderBy(col("exact_dist").asc(), col(id_col).asc())
        .limit(k)
    )
