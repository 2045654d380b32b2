"""Similarity search over an embedding column (``array<float>``).

- ``cosine_sim`` / ``dot`` / ``l2_norm``: pure HOF expressions in double
  precision with left-to-right accumulation, so any engine iterating the
  array in order reproduces them bit-for-bit (oracle parity).
- ``brute_force_topk``: exact top-k against a broadcast query vector —
  O(n·d) scan, the correctness baseline; distributes perfectly (no shuffle
  until the final top-k, which is TakeOrderedAndProject).
- ``lsh_bucket``: random-hyperplane signature for approximate search. The
  hyperplanes are derived deterministically from md5 (no RNG), so plans and
  results are reproducible across runs and engines.
- ``ivf_assign`` / ``ivf_topk``: IVF-style coarse quantization — assign
  every vector to its nearest centroid, search only the query's cell(s).
  At 100 TB the assignment is a broadcast join against C centroids and the
  probe touches 1/C of the data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(
        l2_norm(a) * l2_norm(b), F.lit(1e-12)
    )


def query_vector_literal(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    query: list[float] | Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. Ties broken by id for determinism."""
    q = query_vector_literal(query) if isinstance(query, list) else query
    sim = cosine_sim(as_double(F.col(vec_col)), as_double(q))
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: md5 of (seed, index) →
    uniform in [-0.5, 0.5). No RNG — reproducible everywhere."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{seed}:{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) - 0.5)
    return out


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(vec · plane_i)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        plane = query_vector_literal(_hyperplane(i, dim))
        bit = F.when(dot(as_double(vec), plane) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return bucket


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.
    Recall depends on n_planes; the point is the pruned-scan plan shape."""
    dim = len(query)
    q = query_vector_literal(query)
    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    query_bucket = lsh_bucket(q, dim, n_planes)
    return (
        bucketed.where(F.col("_bucket") == query_bucket)
        .select(
            F.col(id_col),
            F.round(cosine_sim(as_double(F.col(vec_col)), as_double(q)), 6).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine). Broadcast
    cross-join against C centroids + window-min — the IVF build step."""
    from pyspark.sql.window import Window

    joined = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim",
        cosine_sim(as_double(F.col(vec_col)), as_double(F.col(centroid_vec))),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col(centroid_id).asc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, F.col(centroid_id).alias("cell"))
    )
