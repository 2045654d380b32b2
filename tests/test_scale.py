"""Scale-engineering behaviors: salting correctness, partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark, sf_dir):
    from interop_spark.io import load
    from interop_spark.operators.scale import salted_join

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_join(orders, customer, "o_custkey", salt=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark, sf_dir):
    from interop_spark.io import load
    from interop_spark.operators.scale import salted_join

    ev = load(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", "c"), ("view", "v")], "event_type string, code string"
    )
    out = salted_join(ev, dim, "event_type", salt=4, how="left_outer")
    assert out.count() == ev.count()
    # unmatched types survive with NULL code
    assert out.where(F.col("code").isNull()).count() > 0


def test_partition_pruning(spark, sf_dir, tmp_path):
    from interop_spark.io import load
    from interop_spark.operators.scale import (
        with_date_partitions,
        write_partitioned,
    )

    orders = with_date_partitions(load(spark, sf_dir, "orders"), "o_orderdate")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["p_year"])

    back = spark.read.parquet(path)
    pruned = back.where(F.col("p_year") == 1997)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the scan must report a pruned partition count, not the full table
    assert "PartitionFilters: [isnotnull(p_year" in plan or "p_year" in plan
    n_1997 = pruned.count()
    n_all = back.count()
    assert 0 < n_1997 < n_all
    # pruning actually reduced files read
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:
        assert int(m.group(1)) == 1


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two co-bucketed tables join shuffle-free: no Exchange in the plan."""
    from interop_spark.io import load
    from interop_spark.operators.scale import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        load(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8
    )
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() > 0


def test_neardup_plans_have_no_collect_list(spark, sf_dir):
    """Candidate pairing must be a band-key self-join, never a per-bucket
    collect_list of payloads (a bucket-sized array caps at one task's
    memory and defeats AQE skew splitting). Guards the round-2 rework of
    the minhash / simhash / embedding near-dup paths."""
    from interop_spark.queries import all_queries

    qs = all_queries()
    for name in (
        "minhash_lsh_neardup",
        "simhash_neardup_pairs",
        "embedding_neardup",
    ):
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "collect_list" not in plan, f"{name} pairs via collect_list"


def test_ivf_assign_is_shuffle_free(spark, sf_dir):
    """Cell assignment must not shuffle the vector side: the centroid
    table collapses to a one-row broadcast array and the argmax is a
    per-row fold, so the only Exchange in the plan is the C-row centroid
    collapse (SinglePartition), never a hashpartitioning of vectors."""
    from interop_spark.io import load
    from interop_spark.operators.similarity import ivf_assign

    e = load(spark, sf_dir, "embeddings")
    cent = e.where(F.col("vec_id") < 8).selectExpr(
        "vec_id AS centroid_id", "embedding AS centroid"
    )
    plan = (
        ivf_assign(e, cent)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_salted_join_rejects_unsupported_how(spark, sf_dir):
    """Right/full outer would emit unmatched small-side rows salt times."""
    from interop_spark.io import load
    from interop_spark.operators.scale import salted_join

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full_outer", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, customer, "o_custkey", salt=4, how=how)


def test_ivf_probe_plans_scan_materialized_assignment(spark, sf_dir):
    """Both probe queries must read the persisted assignment (ExistingRDD
    scan) instead of re-evaluating the argmax fold inside the probe join
    — the round-2 plan paid the fold 3× via the inferred IsNotNull(cell)
    pushed into the join condition. Also: no hashpartitioning Exchange
    anywhere (the probe is a one-row broadcast)."""
    from interop_spark.queries import all_queries

    qs = all_queries()
    for name in ("ivf_probe_topk", "ivf_multiprobe_topk"):
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Scan ExistingRDD" in plan, f"{name}: assignment not persisted"
        assert "Exchange hashpartitioning" not in plan, f"{name} shuffles"
        # the cell filter/join condition must reference the materialized
        # `cell` column, never re-evaluate the argmax fold (the r2 bug):
        # no Filter/Join line may contain an aggregate fold
        for line in plan.splitlines():
            ls = line.strip()
            if ls.startswith(("Filter", "+- Filter", ":- Filter")) or (
                "Join" in ls and "cell" in ls
            ):
                assert "aggregate(" not in ls, f"{name}: fold in {ls[:120]}"


def test_ingest_corpus_prunes_resource_columns(spark, sf_dir):
    """The bundle-corpus cohort query declares only Patient/Condition:
    no other resource type's extraction may appear in the plan."""
    from interop_spark.queries import all_queries

    plan = (
        all_queries()["fhir_ingest_corpus"](spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the fused tag traversal matches per type via element_at equality
    # and an array_contains gate — neither idiom may reference an
    # undeclared type (the type NAME can still appear inside declared
    # types' field names, e.g. Patient.generalPractitioner)
    for rt in ("Claim", "MedicationRequest", "Practitioner", "Encounter"):
        assert f"= {rt})" not in plan
        assert f", {rt})" not in plan


def test_ivfpq_and_classifier_plans_have_no_exchange(spark, sf_dir):
    """The zero-shuffle claims, pinned: IVF-PQ search (both variants)
    and classifier filtering must plan without any Exchange — broadcast
    assignment + literal tables only."""
    from interop_spark.queries import all_queries

    q = all_queries()
    for name in (
        "ivfpq_search",
        "ivfpq_residual_search",
        "quality_classifier_filter",
    ):
        plan = (
            q[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan, name


def test_enrich_events_broadcasts_dim(spark, sf_dir):
    """The stream-static enrichment's batch twin: dim broadcast, event
    side unshuffled."""
    from interop_spark.queries import all_queries

    plan = (
        all_queries()["enrich_events"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_round8_new_query_plan_shapes(spark, sf_dir):
    """Scale posture of the round-8 additions, pinned:

    - c4_clean and audio_stats are per-row pipelines — ZERO Exchange
      (audio additionally one MapInPandas, Arrow-batched);
    - paragraph_dedup shuffles exactly twice (the md5-hash window and
      the per-doc aggregate), never more — no join back, no collect;
    - ivfpq_rerank's refinement joins the shortlist by BROADCAST (the
      corpus is never shuffled for stage 2)."""
    from interop_spark.queries import all_queries

    q = all_queries()

    def plan_of(name):
        return (
            q[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    for name in ("c4_clean", "audio_stats"):
        p = plan_of(name)
        assert "Exchange hashpartitioning" not in p, name
    assert "MapInPandas" in plan_of("audio_stats")

    p = plan_of("paragraph_dedup")
    assert p.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in p and "collect_set" not in p

    p = plan_of("ivfpq_rerank")
    assert "BroadcastHashJoin" in p
    # the only hash exchanges allowed are inside the (driver-side
    # collected) train/probe chain, not on the raw-vector corpus scan:
    # stage-2's join must not shuffle the embeddings source
    assert "SortMergeJoin" not in p


def test_selection_query_plan_shapes(spark, sf_dir):
    """Scale posture of the continuation-session additions, pinned:

    - dsir_importance's SCORING pass is a zero-shuffle projection (the
      fitted log-ratio vector is a literal; the only jobs the fit runs
      are the 256-key count, already collected at build time);
    - unimax_sample is broadcast-join + projection — no window, no
      per-language sort; its ONLY hash exchange is the 5-row
      per-language count aggregate, never the corpus side;
    - scd2_intervals runs on exactly ONE exchange (user_id serves both
      windows and the run groupBy);
    - bm25_topk never shuffles the corpus (one-row stats broadcast);
    - bm25_inverted_topk joins the posting table to the query terms by
      BROADCAST, never sort-merge."""
    from interop_spark.queries import all_queries

    q = all_queries()

    def plan_of(name):
        return (
            q[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    p = plan_of("dsir_importance")
    assert "Exchange hashpartitioning" not in p

    p = plan_of("unimax_sample")
    assert p.count("Exchange hashpartitioning") == 1  # the lang counts
    assert "Window" not in p
    assert "BroadcastHashJoin" in p

    p = plan_of("scd2_intervals")
    assert p.count("Exchange hashpartitioning") == 1

    p = plan_of("bm25_topk")
    assert "Exchange hashpartitioning" not in p

    p = plan_of("bm25_inverted_topk")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_round10_new_query_plan_shapes(spark, sf_dir):
    """Scale posture of the round-10 additions, pinned:

    - pretrain_pipeline computes every stage as flags over ONE scan:
      the pre-checkpoint flag plan has exactly one hash Exchange (the
      fingerprint window); the post-checkpoint accounting is aggregates
      + a 1x1 broadcast cross join — never a corpus re-scan per stage;
    - the NDJSON resource read is a pure projection pipeline — ZERO
      Exchange (tag filter + typed variant_get, no join, no agg);
    - edit_verified_pairs verifies ONLY candidates: its optimized plan
      carries the Levenshtein on the pair join's output, never a
      cartesian/all-pairs product."""
    from interop_spark.fhir import read_from_ndjson
    from interop_spark.fhir.gen import write_ndjson_corpus
    from interop_spark.queries import all_queries

    q = all_queries()

    p = (
        q["pretrain_pipeline"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # post-checkpoint: the two tiny aggregates (each one exchange at
    # most under AQE) + the 1-row broadcast; the corpus scan and the
    # fingerprint window live behind the checkpoint boundary
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert p.count("Scan ExistingRDD") >= 1  # the single flag frame

    d = write_ndjson_corpus(spark, sf_dir, max_custkey=50)
    obs = read_from_ndjson(
        "file://" + d, spark=spark, glob_filter="*.ndjson"
    ).resource("Observation")
    p = obs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p[:1500]

    p = (
        q["edit_distance_neardup"](spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "levenshtein" in p
    assert "Cartesian" not in p and "collect_list" not in p


def test_bundles_from_ndjson_plan_shape(spark, sf_dir):
    """Scale posture of the round-11 NDJSON→bundle-row bridge, pinned:
    one hash Exchange per resource type (the patient-keyed aggregate),
    aggregation BEFORE the cross-type join (partial collect_list runs
    map-side per type; the join carries per-patient arrays, never raw
    resource rows), a key-equi SortMergeJoin/ShuffledHashJoin across
    types — no cartesian, no corpus-keyed collect, and no window over
    the whole corpus. The verify-join shuffles reuse the aggregate's
    partitioning (the join key IS the groupBy key), so the full-outer
    join adds no extra corpus-side Exchange beyond AQE bookkeeping."""
    from interop_spark.fhir import bundles_from_ndjson, read_from_ndjson
    from interop_spark.fhir.gen import write_ndjson_corpus
    from interop_spark.fhir.schema import (
        CONDITION,
        PATIENT,
        FhirSchemaModel,
    )

    d = write_ndjson_corpus(spark, sf_dir, max_custkey=50)
    nd = read_from_ndjson(
        "file://" + d, spark=spark, glob_filter="*.ndjson"
    )
    entry = bundles_from_ndjson(
        nd,
        ["Patient", "Condition"],
        schemas=FhirSchemaModel(
            fhir_resource_map={"Patient": PATIENT, "Condition": CONDITION}
        ),
    )
    opt = entry._jdf.queryExecution().optimizedPlan().toString()
    assert "Cartesian" not in opt
    # exactly one collect_list aggregate per type, keyed on the patient
    # reference — no corpus-global key anywhere
    assert opt.count("collect_list(") == 2, opt[:2000]
    ex = entry._jdf.queryExecution().executedPlan().toString()
    # map-side partial collect_list per type (aggregate BEFORE the join)
    assert ex.count("partial_collect_list") == 2, ex[:2000]
    # per-type aggregate exchanges + at most the join's ENSURE exchanges
    assert ex.count("Exchange hashpartitioning") <= 4, ex[:2000]
    assert "FullOuter" in ex, ex[:2000]


def test_round11_continuation_plan_shapes(spark, sf_dir):
    """Scale posture of the round-11 continuation additions, pinned:

    - bloom_probe is zero-shuffle on the PROBE side: the batch scan
      crosses only a broadcast of the one-row bitmap; the single hash
      Exchange in the whole plan is the bitmap build's distinct, whose
      key space is capped at n_bits (4096) regardless of history size;
    - pagerank_weights is joins + integer aggregates end-to-end: no
      Cartesian, no collect_list, and the top-k is
      TakeOrderedAndProject — never a global sort materialization;
    - temperature_sample's keep projection is shuffle-free: the corpus
      scan joins only broadcasts (per-language counts + one-row max);
      the hash Exchanges belong to the tiny lang-keyed aggregates."""
    from interop_spark.io import load
    from interop_spark.operators import dedup as dd
    from interop_spark.queries import all_queries

    q = all_queries()

    d = load(spark, sf_dir, "documents")
    probe = dd.bloom_probe(
        d.where(F.col("doc_id") % 2 == 1),
        dd.bloom_bits(d.where(F.col("doc_id") % 2 == 0), "text"),
    )
    ex = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in ex, ex[:1500]
    assert ex.count("Exchange hashpartitioning") <= 1, ex[:2000]

    pr = q["pagerank_weights"](spark, sf_dir)
    opt = pr._jdf.queryExecution().optimizedPlan().toString()
    assert "Cartesian" not in opt and "collect_list" not in opt
    ex = pr._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in ex, ex[:2000]

    ts = q["temperature_sample"](spark, sf_dir)
    ex = ts._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in ex, ex[:1500]
    # lang-count agg + one-row max + final per-lang agg only — the
    # corpus-side keep projection adds no exchange of its own
    assert ex.count("Exchange hashpartitioning") <= 3, ex[:2000]


def test_round12_plan_shapes(spark, sf_dir):
    """Scale posture of the round-12 additions, pinned:

    - ngram_decontaminate never shuffles the CORPUS: the eval set's
      distinct grams broadcast onto the exploded corpus (one
      BroadcastHashJoin); the hash Exchanges belong to the tiny
      benchmark distinct and the post-join collision count, whose
      input is only the COLLIDING grams;
    - omop_observation_period partial-aggregates before its single
      person-keyed shuffle: exactly one hashpartitioning Exchange on
      person_id above the 6-way union, with partial_min/partial_max on
      the map side (each task emits ≤1 row per person);
    - reference_integrity per check: the target-id side is a bounded
      distinct; no Cartesian anywhere, and each check's aggregate is a
      single row (the union of 4 single-row aggregates)."""
    from interop_spark.io import load
    from interop_spark.operators import dedup as dd
    from interop_spark.queries import all_queries

    q = all_queries()

    d = load(spark, sf_dir, "documents")
    dec = dd.ngram_decontaminate(d, d.where(F.col("doc_id") % 50 == 0), n=5)
    ex = dec._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in ex, ex[:1500]
    # benchmark distinct (2 stages of one agg) + final doc-keyed count:
    # the corpus explode itself adds no exchange
    assert ex.count("Exchange hashpartitioning") <= 3, ex[:2000]
    assert "Cartesian" not in ex

    op = q["fhir_omop_observation_period"](spark, sf_dir)
    ex = op._jdf.queryExecution().executedPlan().toString()
    assert ex.count("Exchange hashpartitioning") == 1, ex[:2000]
    assert "partial_min" in ex and "partial_max" in ex, ex[:2000]

    ri = q["fhir_reference_integrity"](spark, sf_dir)
    opt = ri._jdf.queryExecution().optimizedPlan().toString()
    assert "Cartesian" not in opt and "collect_list" not in opt


def test_drug_era_single_exchange(spark, sf_dir):
    """The drug_era gap-and-island derivation plans exactly ONE
    corpus-keyed Exchange: both windows (lag gap flag, running-sum era
    id) share the (person, concept) partitioning and date sort, and
    the final groupBy keys are a superset of the window partition
    keys, so HashPartitioning(person, concept) already satisfies its
    clustering — no second shuffle, no global sort."""
    from interop_spark.queries import all_queries

    df = all_queries()["fhir_omop_drug_era"](spark, sf_dir)
    ex = df._jdf.queryExecution().executedPlan().toString()
    assert ex.count("Exchange hashpartitioning") == 1, ex[:2500]
    assert ex.count("Window") >= 1, ex[:2500]
    assert "Exchange rangepartitioning" not in ex, ex[:2500]


def test_round13_plan_shapes(spark, sf_dir):
    """Round-13 additions hold the posture:
    - condition_era (the _era_merge twin over the NDJSON bridge) keeps
      the era core's contract — its windows/groupBy add exactly ONE
      hashpartitioning Exchange beyond the bridge's per-type
      aggregates, and never a global (range) sort;
    - concept_map_translate BROADCASTS the definitional map: the
      corpus-sized condition side never hash-shuffles on the
      terminology key (only the final per-standard-code aggregate
      exchanges, on 10 keys)."""
    from interop_spark.queries import all_queries

    q = all_queries()

    ex = (
        q["fhir_omop_condition_era"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert ex.count("Window") >= 1, ex[:2500]
    assert "Exchange rangepartitioning" not in ex, ex[:2500]
    # bridge = one exchange per resource type (2) + its join bookkeeping;
    # the era derivation itself must add exactly one more
    n_bridge = (
        q["fhir_ndjson_patient_conditions"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("Exchange hashpartitioning")
    )
    assert ex.count("Exchange hashpartitioning") == n_bridge + 1, (
        ex.count("Exchange hashpartitioning"), n_bridge)

    ex2 = (
        q["fhir_concept_map_translate"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in ex2, ex2[:2500]
    assert "SortMergeJoin" not in ex2, ex2[:2500]

    # weighted priority sample: per-task local top-k, zero Exchange
    ex3 = (
        q["weighted_sample_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in ex3, ex3[:2500]
    assert "Exchange" not in ex3, ex3[:2500]


def test_minhash_incremental_probe_plan_shape(spark, sf_dir):
    """Incremental near-dup probe against a PREBUILT history index:
    the join is new×history (never history×history), the history side
    enters via the checkpointed index scans with no Exchange of its
    own, and no stage materializes per-bucket arrays. With the guard
    on, the only hashpartitioning Exchanges are the hot-band count,
    the candidate distinct, and the new-doc-keyed final aggregate."""
    from interop_spark.io import load
    from interop_spark.operators import dedup as dd

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    idx = dd.build_minhash_index(d.where(F.col("doc_id") % 2 == 0))
    probe = dd.minhash_incremental_dedup(
        d.where(F.col("doc_id") < 50),
        None,
        history_index=idx,
        max_band_docs=64,
    )
    ex = probe._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in ex, ex[:1500]
    assert "collect_list" not in ex, ex[:1500]
    # band-join + 2 shingle re-joins + final left join: equi-joins only
    assert ex.count("Exchange hashpartitioning") <= 5, ex[:2500]
    # verdicts cover every new doc, planted mutations resolve
    rows = {r["doc_id"]: r for r in probe.collect()}
    assert len(rows) == 50
    evens = [r for i, r in rows.items() if i % 2 == 0]
    assert all(r["is_dup"] and r["best_match"] == r["doc_id"] for r in evens)


def test_round12_continuation_selection_plan_shapes(spark, sf_dir):
    """Scale posture of the round-12 continuation selection ops:

    - source_quota_sample ranks ONLY over-quota sources: the plan has
      exactly one Window, and the under-quota bypass reaches it as a
      broadcast anti-join (the corpus never shuffles for sources whose
      count fits the quota — the long-tail common case);
    - domain_quantile_filter never sorts the corpus: threshold
      derivation runs over the bounded (source, score) histogram, the
      thresholds come back as a broadcast, and the corpus-side filter
      adds no exchange of its own (histogram agg + final per-source
      agg are the only corpus-keyed shuffles)."""
    from interop_spark.queries import all_queries

    q = all_queries()

    import math
    import re

    def n_nodes(plan: str, node: str) -> int:
        return len(re.findall(rf"\+\- {node} \[", plan))

    sq = q["source_quota_sample"](spark, sf_dir)
    ex = sq._jdf.queryExecution().executedPlan().toString()
    assert n_nodes(ex, "Window") == 1, ex[:2000]
    # row_number ≤ quota is pushed down as a PARTIAL WindowGroupLimit:
    # map tasks prune to the per-source top-N BEFORE the rank shuffle
    assert "WindowGroupLimit" in ex and "Partial" in ex, ex[:2000]
    assert "BroadcastHashJoin" in ex, ex[:1500]
    assert "CartesianProduct" not in ex
    rows = sq.collect()
    assert rows, "no sources"
    from interop_spark.queries.selection_q import SOURCE_QUOTA

    for r in rows:
        assert r["n_kept"] == min(r["n_total"], SOURCE_QUOTA), r

    dq = q["domain_quantile_filter"](spark, sf_dir)
    ex = dq._jdf.queryExecution().executedPlan().toString()
    assert n_nodes(ex, "Window") == 1, ex[:2000]
    assert "BroadcastHashJoin" in ex, ex[:1500]
    assert "CartesianProduct" not in ex
    rows = dq.collect()
    assert rows
    for r in rows:
        # threshold contract: at least ceil(q·n) docs reach the cut
        k = math.ceil(r["n_total"] / 4)
        assert r["n_kept"] >= k, r
        assert 0 <= r["threshold"] <= 1000, r


def test_round14_plan_shapes(spark, sf_dir):
    """Round-14 additions hold the posture:
    - the observation/specimen CDM mappings are pure typed projections
      over the line-splittable NDJSON scan — ZERO Exchange;
    - device_era keeps the _era_merge contract over the Device/DUS
      bridge: exactly ONE hashpartitioning Exchange beyond the
      bridge's own, and never a global sort;
    - the quality-measure catalog joins its definitional frames
      broadcast-only (no SortMergeJoin);
    - the rank-sketch build/estimate never materializes a corpus-sized
      join (no cartesian product; the survivor filter enters via a
      broadcast threshold)."""
    from interop_spark.fhir import bundles_from_ndjson, read_from_ndjson
    from interop_spark.fhir.gen import write_ndjson_corpus
    from interop_spark.queries import all_queries

    q = all_queries()

    for name in ("fhir_omop_observation", "fhir_omop_specimen"):
        ex = (
            q[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in ex, (name, ex[:2000])

    ex = (
        q["fhir_omop_device_era"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange rangepartitioning" not in ex, ex[:2500]
    d = write_ndjson_corpus(spark, sf_dir, max_custkey=50)
    nd = read_from_ndjson("file://" + d, spark=spark, glob_filter="*.ndjson")
    n_bridge = (
        bundles_from_ndjson(nd, ["Device", "DeviceUseStatement"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("Exchange hashpartitioning")
    )
    assert ex.count("Exchange hashpartitioning") == n_bridge + 1, (
        ex.count("Exchange hashpartitioning"), n_bridge)

    ex2 = (
        q["fhir_quality_measure_catalog"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in ex2, ex2[:2500]
    assert "SortMergeJoin" not in ex2, ex2[:2500]

    ex3 = (
        q["quantile_sketch_estimate"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in ex3, ex3[:2500]
    assert "BroadcastExchange" in ex3, ex3[:2500]


def test_round15_plan_shapes(spark, sf_dir):
    """Round-15 additions hold the posture:
    - visit_detail is a pure posexplode projection over the
      line-splittable ext-corpus scan — ZERO Exchange;
    - the request-group proof row resolves its 6 definitions
      broadcast-only (no SortMergeJoin) and its single Exchange is the
      bounded (url, status)-keyed rollup;
    - the DoReMi converge loop's returned frame reads the final
      localCheckpointed sources-sized state — no corpus-sized operator
      (no CartesianProduct, no Exchange) survives into the last plan,
      because every round's state was truncated at a bounded frame."""
    from interop_spark.queries import all_queries

    q = all_queries()

    ex = (
        q["fhir_omop_visit_detail"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in ex, ex[:2000]

    ex2 = (
        q["fhir_request_group_actions"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in ex2, ex2[:2500]
    assert "SortMergeJoin" not in ex2, ex2[:2500]
    assert ex2.count("Exchange hashpartitioning") <= 2, ex2[:2500]

    ex3 = (
        q["domain_reweight_converge"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in ex3, ex3[:2500]
    assert "Exchange" not in ex3, ex3[:2500]


def test_simhash_guard_drops_hot_band_pairs(spark):
    """The r15 hot-band guard (simhash_candidate_pairs max_band_docs —
    r14 verdict item 3): a planted mega-cluster of identical docs
    (sharing ALL bands, bucket size over the cap) contributes ZERO
    pairs under the guard, while an ordinary near-dup pair (bucket
    size 2) survives; unguarded output is a strict superset containing
    the full O(cluster²) pair fan-out."""
    from interop_spark.operators.dedup import simhash_candidate_pairs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [(i, "clone " + base) for i in range(10)]  # mega-cluster
    rows += [(100, "pair one " + base), (101, "pair one " + base + "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    unguarded = simhash_candidate_pairs(
        df, "doc_id", "text", hamming_max=12, max_band_docs=None
    ).collect()
    guarded = simhash_candidate_pairs(
        df, "doc_id", "text", hamming_max=12, max_band_docs=8
    ).collect()

    un_pairs = {(r.doc_a, r.doc_b) for r in unguarded}
    g_pairs = {(r.doc_a, r.doc_b) for r in guarded}
    # identical clones: all 45 pairs present unguarded, gone guarded
    clone_pairs = {(a, b) for a in range(10) for b in range(10) if a < b}
    assert clone_pairs <= un_pairs
    assert not (clone_pairs & g_pairs)
    # the ordinary near-dup pair survives both
    assert (100, 101) in un_pairs
    assert (100, 101) in g_pairs
    assert g_pairs <= un_pairs


def test_round15b_plan_shapes(spark, sf_dir):
    """Round-15b additions hold the posture:
    - int4_roundtrip and fact_relationship are pure projection plans —
      ZERO Exchange;
    - the formulary proof row resolves its 30 MedicationKnowledge
      records broadcast-only (no SortMergeJoin) and its single Exchange
      is the bounded code-keyed rollup;
    - the theta-sketch pair algebra never SortMergeJoins — every
      post-sketch join reads broadcast k-bounded frames — and the
      episode chain's level-1/level-2 windows reuse one (person,
      concept) partitioning (era + episode derivation adds no second
      hashpartitioning exchange on a different key)."""
    from interop_spark.queries import all_queries

    q = all_queries()

    for name in ("int4_roundtrip", "fhir_omop_fact_relationship"):
        ex = (
            q[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in ex, (name, ex[:2000])

    ex2 = (
        q["fhir_medication_knowledge_costs"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in ex2, ex2[:2500]
    assert "SortMergeJoin" not in ex2, ex2[:2500]
    assert ex2.count("Exchange hashpartitioning") <= 2, ex2[:2500]

    ex3 = (
        q["theta_sketch_setops"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in ex3, ex3[:2500]
    assert "CartesianProduct" not in ex3, ex3[:2500]

    ex4 = (
        q["fhir_omop_episode"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE (person, concept) hashpartitioning serves the level-1 era
    # windows+agg AND the level-2 episode windows+agg (the NDJSON
    # bridge's own per-patient collect_list exchanges are upstream of
    # the era chain and not what this pin is about)
    assert ex4.count("Exchange hashpartitioning(person_id") == 1, ex4[:3000]


def test_round16_plan_shapes(spark, sf_dir):
    """Round-16 additions hold the posture:
    - unicode_normalize_stats: the Arrow pandas-UDF normalization is a
      single scan-side projection (one ArrowEvalPython, no Python rows
      crossing an Exchange); the only Exchange is the bounded
      (lang, source) partial aggregate;
    - fhir_notebook_e2e's final frame joins the two WRITTEN parquet
      tables on bundleUUID plus the bounded writer re-parse — no
      CartesianProduct anywhere (the variant re-parse is a projection);
    - stream_cms_topk's post-fold probe joins the distinct user frame
      against the BROADCAST <=depth*width sketch (no SortMergeJoin
      against the sketch side)."""
    from interop_spark.queries import all_queries

    q = all_queries()

    ex = (
        q["unicode_normalize_stats"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert ex.count("ArrowEvalPython") == 1, ex[:2500]
    assert "CartesianProduct" not in ex, ex[:2500]
    assert ex.count("Exchange hashpartitioning") <= 1, ex[:2500]

    ex2 = (
        q["fhir_notebook_e2e"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in ex2, ex2[:2500]

    ex3 = (
        q["stream_cms_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in ex3, ex3[:2500]
