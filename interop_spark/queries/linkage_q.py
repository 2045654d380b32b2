"""Record-linkage family (module introduced r17; linkage_entities
registered and linkage_incremental added r18).

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
# Staged in r17, REGISTERED r18 (the staging convention: parity proven
# a full round before the driver row went live).
# --------------------------------------------------------------------------


def _crosswalk(records: DataFrame) -> DataFrame:
    """Records → (rec_id, entity_id) crosswalk: blocked pairing + the
    verify band, connected components by min-label propagation
    (``operators/dedup.dedup_clusters``), singletons coalesced to
    their own entity. ONE implementation of the linkage semantics —
    q_linkage_entities (full registry) and q_linkage_incremental
    (prior-state base) both call it, so the verify band and the
    survivorship rule can never silently diverge between the two rows.
    The pair frame localCheckpoints because dedup_clusters re-evaluates
    its edge frame per propagation iteration."""
    from interop_spark.operators.dedup import dedup_clusters

    pairs = blocked_pairs(
        records, ["birth_year", "state"], "rec_id", max_block_size=MAX_BLOCK
    )
    dist = F.levenshtein(col("family_a"), col("family_b"))
    matched = pairs.where(
        (col("given_a") == col("given_b")) & (dist <= MAX_FAMILY_DIST)
    ).localCheckpoint()
    lab = dedup_clusters(matched, a="rec_id_a", b="rec_id_b").select(
        col("doc_id").alias("rec_id"),
        col("cluster").alias("entity_id"),
    )
    return (
        records.select("rec_id")
        .join(lab, "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce(col("entity_id"), col("rec_id")).alias("entity_id"),
        )
    )


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
    original, so propagation converges in 2 rounds. Core is the shared
    ``_crosswalk`` (also the incremental row's prior state)."""
    ents = _crosswalk(_registry(spark, sf_dir))
    return ents.select(
        "rec_id",
        "entity_id",
        (col("rec_id") == col("entity_id")).alias("is_survivor"),
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

QUERIES["linkage_entities"] = q_linkage_entities

# recursive min-label reachability — the neardup_clusters oracle idiom
# over the linkage pair graph, with singleton records coalesced to
# their own entity
ORACLE["linkage_entities"] = f"""
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
    """


# --------------------------------------------------------------------------
# NEW round-18: incremental linkage — the production EMPI shape
# (r17 verdict item 5).
# --------------------------------------------------------------------------

# second planted arrival class: every custkey ≡ 7 (mod 9) also sends a
# GENUINELY NEW patient (rec_id offset 2x) whose family name carries a
# 3-char suffix — edit distance ≥ 3 from every dictionary name, so the
# verify band can never claim it and the assignment must MINT an
# entity. Both batch classes are closed-form custkey arithmetic, so
# the DuckDB twin rebuilds them exactly.
NEW_RESIDUE, NEW_OFFSET = 7, 2 * DUP_OFFSET


def _registry_prefix(sf_dir: str) -> str:
    """Crosswalk-table prefix for a fixture directory — INJECTIVE per
    directory (ADVICE r18 #2): the readable basename slug alone can
    alias distinct fixtures ('sf0.1' and 'sf0_1' both sanitize to
    'sf0_1'), and the stale-registry purge deletes tables under the
    prefix, so the full absolute path's crc32 is folded in. The slug
    is LOWERCASED: Spark stores table names lowercased, so a
    mixed-case prefix would never match ``listTables`` output and the
    purge would silently no-op (r19 review). The crc is computed over
    the original-case path, so distinct dirs differing only by case
    still get distinct prefixes."""
    import os
    import re
    import zlib

    slug = re.sub(
        r"[^A-Za-z0-9]",
        "_",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    ).lower()
    path_fp = zlib.crc32(os.path.abspath(sf_dir).encode("utf-8"))
    return f"linkage_registry_{slug}_{path_fp:08x}_"


def q_linkage_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental entity resolution: an arriving batch (the planted
    typo duplicates + the planted genuinely-new patients) is matched
    against the PERSISTED entity crosswalk — never against the raw
    corpus. Prior state = ``linkage_entities``' survivor registry over
    the already-linked base records, written BUCKETED on the block key
    (``operators/scale.write_bucketed``, sf-keyed table name — the
    bucketed_join_agg convention); the incremental step is
    ``operators/linkage.incremental_pairs``: a block-key equi-join
    whose ONLY shuffle is the batch side (plan-asserted in
    tests/test_linkage.py), per-pair verify (exact given + family
    levenshtein ≤ 2) on co-members only, min-survivor assignment for
    matches, minted entity (= own rec_id) for the rest. At 100 TB the
    crosswalk is written once and every arriving batch streams past it
    pre-co-located — the production form of the reference's staging
    dedupe (its left-outer exists flag, 01_dbignite_sample.py:370-379).
    The registry table is CACHED across invocations behind a content
    fingerprint (the ``land_event_chunks`` cache-key convention: row
    count + order-independent crc32 folded into the table name), so
    repeated runs — the bench's timed reps in particular — measure the
    incremental step, not prior-state reconstruction, while a
    regenerated fixture can never reuse a stale crosswalk.
    Output: one row per batch record (rec_id, entity_id, is_new)."""
    import os
    import shutil
    from urllib.parse import urlparse

    from interop_spark.operators.linkage import incremental_pairs
    from interop_spark.operators.scale import write_bucketed

    records = _registry(spark, sf_dir)
    base = records.where(col("rec_id") < DUP_OFFSET)
    dups = records.where(col("rec_id") >= DUP_OFFSET)
    novel = base.where(col("rec_id") % DUP_MOD == NEW_RESIDUE).select(
        (col("rec_id") + NEW_OFFSET).alias("rec_id"),
        "given",
        F.concat("family", F.lit("xyz")).alias("family"),
        "birth_year",
        "state",
    )
    batch = dups.unionByName(novel)

    # ---- prior state: crosswalk over the ALREADY-LINKED base records
    # (the shared _crosswalk core), persisted bucketed + fingerprint-
    # keyed so it builds once per fixture content ---------------------
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.crc32(
                F.concat_ws(
                    "|", *[col(c).cast("string") for c in base.columns]
                )
            )
        ).alias("fp"),
    ).first()
    fp = stats["fp"] or 0
    prefix = _registry_prefix(sf_dir)
    t_reg = f"{prefix}r{stats['n']}_f{fp:x}"
    if not spark.catalog.tableExists(t_reg):
        entities = _crosswalk(base)
        survivors = (
            entities.where(col("rec_id") == col("entity_id"))
            .join(base, "rec_id")
            .select(
                "entity_id",
                "given",
                "family",
                (col("birth_year") * 100 + col("state"))
                .cast("int")
                .alias("block_key"),
            )
        )
        # purge registries built from superseded fixture content —
        # scoped to the CURRENT database explicitly (ADVICE r18 #2:
        # listTables() without an argument already lists only the
        # current database, but the drop below must name the same
        # database it listed, and the warehouse dir for a non-default
        # database carries a `<db>.db` segment)
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        db = spark.catalog.currentDatabase()
        dbdir = (
            wh if db == "default" else os.path.join(wh, f"{db}.db")
        ) if wh else ""
        # legacy-scheme names (pre-crc, `linkage_registry_<slug>_rN_fH`
        # with no 8-hex path segment) are obsolete by construction —
        # no code path can reuse them after the prefix change — so the
        # migration sweep drops them regardless of slug (r19 review:
        # otherwise a persistent metastore leaks them forever)
        import re as _re

        _cur = _re.compile(
            r"linkage_registry_.*_[0-9a-f]{8}_r\d+_f[0-9a-f]+\Z"
        )
        _legacy = _re.compile(r"linkage_registry_.*_r\d+_f[0-9a-f]+\Z")
        for t in spark.catalog.listTables(db):
            stale_cur = t.name.startswith(prefix) and t.name != t_reg
            stale_legacy = bool(
                _legacy.fullmatch(t.name)
            ) and not _cur.fullmatch(t.name)
            if stale_cur or stale_legacy:
                spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{t.name}`")
                if dbdir:
                    shutil.rmtree(
                        os.path.join(dbdir, t.name), ignore_errors=True
                    )
        if dbdir:
            shutil.rmtree(os.path.join(dbdir, t_reg), ignore_errors=True)
        write_bucketed(survivors, t_reg, "block_key", 8)

    # ---- the incremental step: batch vs persisted registry ---------
    b = batch.select(
        "rec_id",
        "given",
        "family",
        (col("birth_year") * 100 + col("state"))
        .cast("int")
        .alias("block_key"),
    )
    cand = incremental_pairs(b, spark.table(t_reg), "block_key")
    hits = cand.where(
        (col("given_new") == col("given_reg"))
        & (F.levenshtein(col("family_new"), col("family_reg")) <= MAX_FAMILY_DIST)
    )
    assigned = hits.groupBy(col("rec_id_new").alias("rec_id")).agg(
        F.min("entity_id_reg").alias("matched_entity")
    )
    return (
        batch.select("rec_id")
        .join(assigned, "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce(col("matched_entity"), col("rec_id")).alias(
                "entity_id"
            ),
            col("matched_entity").isNull().alias("is_new"),
        )
    )


QUERIES["linkage_incremental"] = q_linkage_incremental

# base-only components → survivor registry → batch assignment, all in
# closed-form custkey arithmetic (same recursive reach idiom as
# linkage_entities, restricted to base-base edges)
ORACLE["linkage_incremental"] = f"""
    WITH RECURSIVE {_REGISTRY_CTES},
    novel AS (
      SELECT rec_id + {NEW_OFFSET} AS rec_id, given,
             family || 'xyz' AS family, birth_year, state
      FROM base WHERE rec_id % {DUP_MOD} = {NEW_RESIDUE}
    ),
    batch AS (
      SELECT * FROM dup UNION ALL SELECT * FROM novel
    ),
    bsizes AS (
      SELECT birth_year, state, count(*) AS bn
      FROM base GROUP BY 1, 2
    ),
    bok AS (
      SELECT b.* FROM base b
      JOIN bsizes s USING (birth_year, state)
      WHERE s.bn <= {MAX_BLOCK}
    ),
    bpairs AS (
      SELECT a.rec_id AS ra, b.rec_id AS rb
      FROM bok a
      JOIN bok b ON a.birth_year = b.birth_year
                AND a.state = b.state
                AND a.rec_id < b.rec_id
      WHERE a.given = b.given
        AND levenshtein(a.family, b.family) <= {MAX_FAMILY_DIST}
    ),
    edges AS (
      SELECT ra AS src, rb AS dst FROM bpairs
      UNION
      SELECT rb, ra FROM bpairs
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
    ),
    entities AS (
      SELECT b.rec_id, coalesce(l.entity_id, b.rec_id) AS entity_id
      FROM base b LEFT JOIN lab l USING (rec_id)
    ),
    survivors AS (
      SELECT e.entity_id, r.given, r.family, r.birth_year, r.state
      FROM entities e
      JOIN base r ON r.rec_id = e.rec_id
      WHERE e.rec_id = e.entity_id
    ),
    matched AS (
      SELECT d.rec_id, min(s.entity_id) AS matched_entity
      FROM batch d
      JOIN survivors s
        ON s.birth_year = d.birth_year AND s.state = d.state
       AND s.given = d.given
       AND levenshtein(s.family, d.family) <= {MAX_FAMILY_DIST}
      GROUP BY 1
    )
    SELECT d.rec_id,
           coalesce(m.matched_entity, d.rec_id) AS entity_id,
           m.matched_entity IS NULL AS is_new
    FROM batch d LEFT JOIN matched m USING (rec_id)
"""
