"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Algorithms are the classic public constructions: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
1997) with banded LSH amplification, and SimHash (Charikar, "Similarity
estimation techniques from rounding algorithms", STOC 2002).

Scale design
------------
- Exact dedup is a hash-groupBy on a fingerprint — one shuffle keyed by the
  md5, which distributes uniformly (no skew) at any scale.
- MinHash signatures are per-row HOF expressions (no shuffle); LSH banding
  turns the quadratic all-pairs problem into an equi-join on (band, key) —
  the join key space grows with corpus size, so candidate buckets stay
  small and AQE handles stragglers.
- Portability: hash family is md5-of-(seed || shingle) with lexicographic
  min, which any engine reproduces exactly (used by the DuckDB oracle).
- SimHash packs 60 bits from md5-derived token hashes; near-dup candidates
  join on 15-bit bands (Hamming ≤ 3 within 60 bits guarantees one equal
  band by pigeonhole across 4 bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from interop_spark.operators.text import fingerprint, tokens

SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit long


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document."""
    t = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    )


def _seeded_md5(j: int):
    # factory, NOT a default-arg lambda: a binary lambda passed to
    # F.transform receives (element, index) — the index Column would
    # silently replace the seed (and its auto-generated name varies per
    # plan, making results nondeterministic across plan constructions)
    prefix = f"{j}|"
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """k-element MinHash signature: for seed j, min over shingles of
    md5(j || '|' || shingle), compared lexicographically (portable across
    engines — no engine-specific 64-bit hash needed)."""
    return F.array(
        *[F.array_min(F.transform(shingles, _seeded_md5(j))) for j in range(k)]
    )


def lsh_band_keys(signature: Column, bands: int = 4, rows: int = 3) -> Column:
    """Band the signature: band key = md5 of the concatenated rows.
    Docs sharing any (band_index, key) become candidate pairs."""
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(
                    F.concat_ws(
                        "|", *[signature[b * rows + r] for r in range(rows)]
                    )
                ),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(inter / F.greatest(union, F.lit(1)), 4)


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: representative
    id (min), group size. One uniform shuffle; scales linearly."""
    return (
        df.select(
            fingerprint(F.col(text_col)).alias("fp"), F.col(id_col).alias("_id")
        )
        .groupBy("fp")
        .agg(
            F.min("_id").alias("representative_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int = 4,
    rows: int = 3,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidates with exact-Jaccard verification.

    Pipeline: shingle → signature → band keys → explode → groupBy band key →
    in-bucket pair generation (HOF over the sorted doc list) → distinct
    (a < b) pairs → exact Jaccard on the shingle sets.

    One shuffle (the bucket groupBy), no self-join: candidate buckets are
    tiny by construction (LSH spreads non-dups across the key space), so
    collect_list per bucket is O(bucket²) only where near-dups actually
    exist. A pathological all-identical corpus would skew one bucket —
    salt the band key with a fingerprint prefix if that matters. The
    shingle arrays ride along at test scale; at 100 TB you would re-join
    them from a compact doc table instead.
    """
    assert k >= bands * rows
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    ).select(
        "doc_id",
        "shingles",
        minhash_signature(F.col("shingles"), k).alias("sig"),
    )
    # explode a CONSTANT band-index sequence and derive each band key
    # after the explode: exploding the band_keys array directly makes
    # InferFiltersFromGenerate push the whole minhash expression into the
    # scan filter, doubling the (expensive) hashing work per row — the
    # constant sequence folds that inferred filter away, and the signature
    # is computed once per document in the pre-explode projection
    banded = sig.select(
        "doc_id",
        "shingles",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("_b"),
        F.col("sig"),
    ).select(
        "doc_id",
        "shingles",
        F.concat(
            F.col("_b").cast("string"),
            F.lit(":"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(F.col("sig"), F.col("_b") * rows + r + 1)
                        for r in range(rows)
                    ],
                )
            ),
        ).alias("band_key"),
    )
    buckets = (
        banded.groupBy("band_key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "shingles"))
            ).alias("docs")
        )
        .where(F.size("docs") >= 2)
    )
    # all (i < j) pairs within a bucket, as one flat HOF expression
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("docs"), i + 2, F.greatest(F.size("docs"), F.lit(1))
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            jaccard(F.col("p.a.shingles"), F.col("p.b.shingles")).alias(
                "jaccard_sim"
            ),
        )
        .distinct()
    )


def _bit_test(bit: int):
    # factory, not default-arg lambda: F.filter passes (elem, idx) to binary
    # lambdas; and shiftright (never `/`, which routes through double and
    # loses precision past 2^53) keeps the math exact on 60-bit hashes
    return lambda h: F.shiftright(h, bit) % 2 == 1


def token_hashes(text: Column) -> Column:
    """60-bit integer hash per distinct token (md5-derived, portable)."""
    return F.transform(
        F.array_distinct(tokens(text)),
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint"),
    )


def simhash_of_hashes(th: Column) -> Column:
    """60-bit SimHash over a pre-computed token-hash array: bit b of the
    result is the majority vote of bit b across tokens. Pass a
    MATERIALIZED column (not the token_hashes expression inline): the 60
    per-bit filters each reference the array, and feeding them the raw
    expression makes codegen re-derive the md5 hashes per bit."""
    n = F.size(th)
    out = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        bit_count = F.size(F.filter(th, _bit_test(b)))
        out = out + F.when(
            bit_count * 2 > n, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return out


def simhash(text: Column) -> Column:
    """Single-expression SimHash (convenience form; for hot paths
    materialize ``token_hashes`` into a column and use
    ``simhash_of_hashes`` — see the pipeline queries)."""
    return simhash_of_hashes(token_hashes(text))


def simhash_bands(sim: Column, bands: int = 4) -> Column:
    """Split the 60-bit simhash into ``bands`` equal bit-slices. Hamming
    distance ≤ bands-1 guarantees at least one identical band."""
    width = SIMHASH_BITS // bands
    return F.array(
        *[
            F.shiftright(sim, b * width) % F.lit(1 << width).cast("bigint")
            for b in range(bands)
        ]
    )
