"""Round-17 record-linkage row (new module so existing modules'
out-of-window green rows stay untouched — the window invariant note in
``queries/__init__``).

``patient_record_linkage`` — blocked EMPI-style entity resolution over
a deterministically planted patient registry (r16 verdict item 4). The
reference's dedupe intent is patient identity (its notebook derives a
patient MPI frame and carries the EMPI/SSN/DL identifier idioms,
reference 01_dbignite_sample.py:370-379, :453); the registry's near-dup
families cover documents, so this is the structured-record complement:
blocking-key equi-join + bounded per-pair verify (name edit distance +
given-name match), never all-pairs — ``operators/linkage.blocked_pairs``
applied to patient demographics.

Fixture: the registry derives from ``customer`` with pure arithmetic
(identically expressible in DuckDB, so the oracle is a full value-hash
twin): given/family names indexed from fixed 16-name lists by custkey
arithmetic, birth_year = 1950 + custkey % 50, state = c_nationkey.
Every custkey ≡ 3 (mod 9) gets a planted DUPLICATE record (rec_id
offset by 10M) whose family name carries a one-char deletion typo and
whose demographics are unchanged — the classic registration-desk
double-entry. Blocking on (birth_year, state) puts each duplicate in
its original's block; the verify accepts family edit distance ≤ 2 with
an exact given-name match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load
from interop_spark.operators.linkage import blocked_pairs

# fixed name dictionaries (pairwise family edit distance is large, so
# within a block only the planted one-deletion typos — and genuinely
# identical names — land inside the ≤2 verify band)
GIVEN_NAMES = (
    "Alice", "Benjamin", "Carmen", "Dmitri", "Elena", "Farid",
    "Grace", "Hiroshi", "Ingrid", "Javier", "Keiko", "Lamar",
    "Marisol", "Nadia", "Oluwaseun", "Priya",
)
FAMILY_NAMES = (
    "Abernathy", "Blackwood", "Castellanos", "Dombrowski",
    "Eichelberger", "Fitzgerald", "Gutierrez", "Hollingsworth",
    "Ivanovich", "Jaramillo", "Kowalczyk", "Lindqvist",
    "Montgomery", "Nakamura", "Okonkwo", "Pemberton",
)
DUP_MOD, DUP_RESIDUE, DUP_OFFSET = 9, 3, 10_000_000
MAX_BLOCK, MAX_FAMILY_DIST = 1000, 2


def _registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted patient registry: one record per customer + a typo'd
    duplicate for every custkey ≡ 3 (mod 9)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    given = F.element_at(
        F.array(*[F.lit(g) for g in GIVEN_NAMES]),
        (col("c_custkey") % 16 + 1).cast("int"),
    )
    family = F.element_at(
        F.array(*[F.lit(f) for f in FAMILY_NAMES]),
        (F.expr("c_custkey div 16") % 16 + 1).cast("int"),
    )
    base = c.select(
        col("c_custkey").cast("long").alias("rec_id"),
        given.alias("given"),
        family.alias("family"),
        (F.lit(1950) + col("c_custkey") % 50).cast("int").alias(
            "birth_year"
        ),
        col("c_nationkey").alias("state"),
    )
    dup = base.where(col("rec_id") % DUP_MOD == DUP_RESIDUE).select(
        (col("rec_id") + DUP_OFFSET).alias("rec_id"),
        "given",
        # one-char deletion typo: drop the 3rd character
        F.concat(
            F.substring("family", 1, 2), F.expr("substring(family, 4)")
        ).alias("family"),
        "birth_year",
        "state",
    )
    return base.unionByName(dup)


def q_patient_record_linkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Blocked linkage over the planted registry: block on
    (birth_year, state), verify family edit distance ≤ 2 + exact given
    match. Plan shape: ONE record shuffle on the block key (the size
    guard semi-join and the pairing self-join share it), per-pair
    levenshtein only on block co-members, no CartesianProduct
    (plan-asserted in tests/test_linkage.py)."""
    records = _registry(spark, sf_dir)
    pairs = blocked_pairs(
        records,
        ["birth_year", "state"],
        "rec_id",
        max_block_size=MAX_BLOCK,
    )
    dist = F.levenshtein(col("family_a"), col("family_b"))
    return (
        pairs.where(
            (col("given_a") == col("given_b"))
            & (dist <= MAX_FAMILY_DIST)
        )
        .select(
            col("rec_id_a"),
            col("rec_id_b"),
            col("given_a").alias("given"),
            "birth_year",
            "state",
            dist.cast("int").alias("family_dist"),
        )
    )


# --------------------------------------------------------------------------
# ROUND-18 STAGED CANDIDATE — full query+oracle pair kept OUTSIDE
# QUERIES/ORACLE (the staging convention: parity proven a round before
# the driver row registers). r18 registers it by moving the dict
# entries into QUERIES/ORACLE and the window.
# --------------------------------------------------------------------------


def q_linkage_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched pairs → ENTITIES (the EMPI crosswalk table): connected
    components by min-label propagation (``operators/dedup.py
    dedup_clusters`` — the same engine the document near-dup clusters
    use, applied to the linkage pair graph), then every registry
    record gets its entity id (= min rec_id reachable; singletons are
    their own entity) and a survivorship flag (the golden record is
    the entity's min rec_id — here always the original registration,
    since planted duplicates carry offset ids). Iterations are bounded
    by component diameter — linkage components are stars around an
    original, so propagation converges in 2 rounds."""
    from interop_spark.operators.dedup import dedup_clusters

    records = _registry(spark, sf_dir)
    # checkpoint: dedup_clusters re-evaluates its edge frame on every
    # propagation iteration (join + convergence count), which would
    # re-run the blocked self-join + levenshtein from the customer
    # scan each round — materialize the pairs once
    pairs = q_patient_record_linkage(spark, sf_dir).localCheckpoint()
    lab = dedup_clusters(pairs, a="rec_id_a", b="rec_id_b").select(
        col("doc_id").alias("rec_id"),
        col("cluster").alias("entity_id"),
    )
    return (
        records.select("rec_id")
        .join(lab, "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce(col("entity_id"), col("rec_id")).alias(
                "entity_id"
            ),
        )
        .select(
            "rec_id",
            "entity_id",
            (col("rec_id") == col("entity_id")).alias("is_survivor"),
        )
    )


def _given_sql() -> str:
    names = ", ".join(f"'{g}'" for g in GIVEN_NAMES)
    return f"([{names}])[CAST(c_custkey % 16 AS INT) + 1]"


def _family_sql() -> str:
    names = ", ".join(f"'{f}'" for f in FAMILY_NAMES)
    return f"([{names}])[CAST((c_custkey // 16) % 16 AS INT) + 1]"


_REGISTRY_CTES = f"""base AS (
          SELECT CAST(c_custkey AS BIGINT) AS rec_id,
                 {_given_sql()} AS given,
                 {_family_sql()} AS family,
                 CAST(1950 + c_custkey % 50 AS INT) AS birth_year,
                 c_nationkey AS state
          FROM customer
        ),
        dup AS (
          SELECT rec_id + {DUP_OFFSET} AS rec_id, given,
                 substr(family, 1, 2) || substr(family, 4) AS family,
                 birth_year, state
          FROM base WHERE rec_id % {DUP_MOD} = {DUP_RESIDUE}
        ),
        records AS (
          SELECT * FROM base UNION ALL SELECT * FROM dup
        ),
        sizes AS (
          SELECT birth_year, state, count(*) AS bn
          FROM records GROUP BY 1, 2
        ),
        ok AS (
          SELECT r.* FROM records r
          JOIN sizes s USING (birth_year, state)
          WHERE s.bn <= {MAX_BLOCK}
        )"""

_PAIRS_SELECT = f"""SELECT a.rec_id AS rec_id_a, b.rec_id AS rec_id_b,
               a.given AS given, a.birth_year AS birth_year,
               a.state AS state,
               CAST(levenshtein(a.family, b.family) AS INT)
                 AS family_dist
        FROM ok a
        JOIN ok b ON a.birth_year = b.birth_year
                 AND a.state = b.state
                 AND a.rec_id < b.rec_id
        WHERE a.given = b.given
          AND levenshtein(a.family, b.family) <= {MAX_FAMILY_DIST}"""

QUERIES = {
    "patient_record_linkage": q_patient_record_linkage,
}

ORACLE = {
    "patient_record_linkage": f"""
        WITH {_REGISTRY_CTES}
        {_PAIRS_SELECT}
    """,
}

R18_CANDIDATE_QUERIES = {
    "linkage_entities": q_linkage_entities,
}

# recursive min-label reachability — the neardup_clusters oracle idiom
# over the linkage pair graph, with singleton records coalesced to
# their own entity
R18_CANDIDATE_ORACLE = {
    "linkage_entities": f"""
        WITH RECURSIVE {_REGISTRY_CTES},
        pairs AS (
          {_PAIRS_SELECT}
        ),
        edges AS (
          SELECT rec_id_a AS src, rec_id_b AS dst FROM pairs
          UNION
          SELECT rec_id_b, rec_id_a FROM pairs
        ),
        reach AS (
          SELECT src AS node, src AS lab FROM edges
          UNION
          SELECT e.dst, reach.lab FROM reach
          JOIN edges e ON e.src = reach.node
        ),
        lab AS (
          SELECT node AS rec_id, min(lab) AS entity_id
          FROM reach GROUP BY 1
        )
        SELECT r.rec_id,
               coalesce(l.entity_id, r.rec_id) AS entity_id,
               (r.rec_id = coalesce(l.entity_id, r.rec_id))
                 AS is_survivor
        FROM records r LEFT JOIN lab l USING (rec_id)
    """,
}
