"""Notebook-parity end-to-end chain (r11 verdict item 7): replay the
reference notebook's FULL sequence as one test — ingest → entry() →
flattens → table sinks → dedupe-lookup → ADT timeline over the WRITTEN
tables → OMOP CTAS → writer roundtrip — mirroring the reference CI's own
pass criterion ("notebook completes",
`.github/workflows/integration-test-aws-pr.yml`). Every stage asserts
its row count, so a regression anywhere in the chain fails loudly even
when each piece's unit test still passes (the pieces were all tested;
the CHAINED run was not).

Stage map to `/root/reference/01_dbignite_sample.py`:
  1. read_from_directory → entry()            (:20-26)
  2. patient_conditions flatten + table sink  (:47-72)
  3. patient_claims flatten + table sink      (:78-116)
  4. medication_requests w/ schema override   (:118-174)
  5. claim dedupe-lookup exists flag          (:384-397)
  6. ADT: entry → bulk_table_write(Patient,
     MessageHeader) → timeline over TABLES    (:404-459)
  7. OMOP person CTAS                         (:472-484)
  8. derived drug eras from the WRITTEN
     occurrence table (shared _era_merge)     (:472-484, extended)
  9. cohort selection over the WRITTEN
     condition/drug occurrence tables         (:472-484, extended)
 10. df_to_fhir writer roundtrip              (:560-602)
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

ADT_DIR = "/root/reference/sampledata/adt_records/"
N_BUNDLES = 100  # own corpus fixture dir (keyed by max_custkey)


def test_notebook_chain(spark, sf_dir, tmp_path):
    from interop_spark.fhir import read_from_directory
    from interop_spark.fhir.analytics import (
        adt_events,
        medication_requests,
        omop_person,
        patient_claims,
        patient_conditions,
    )
    from pyspark.sql.types import StructField, StructType

    from interop_spark.fhir.gen import write_corpus
    from interop_spark.fhir.schema import (
        CODEABLE_CONCEPT,
        MEDICATION_REQUEST,
        FhirSchemaModel,
    )
    from interop_spark.fhir.write import (
        bulk_table_write,
        drop_table_if_exists,
        save_as_table,
    )

    loc = "hls_healthcare.hls_dev"

    # -- 1. ingest a bundle directory, materialize entry() ------------
    corpus = write_corpus(spark, sf_dir, max_custkey=N_BUNDLES)
    entry = read_from_directory(
        "file://" + corpus, spark=spark, glob_filter="*.json"
    ).entry(
        schemas=FhirSchemaModel().with_overrides(
            {
                "MedicationRequest": StructType(
                    MEDICATION_REQUEST.fields
                    + [
                        StructField(
                            "medicationCodeableConcept",
                            CODEABLE_CONCEPT,
                            True,
                        )
                    ]
                )
            }
        )
    )
    assert entry.count() == N_BUNDLES

    # -- 2. conditions flatten → table ---------------------------------
    conds = patient_conditions(entry)
    drop_table_if_exists(spark, f"{loc}.patient_conditions")
    save_as_table(conds, f"{loc}.patient_conditions")
    assert spark.table(
        "hls_healthcare_hls_dev.patient_conditions"
    ).count() == N_BUNDLES  # one condition per bundle

    # -- 3. claims flatten → table -------------------------------------
    claims = patient_claims(entry)
    drop_table_if_exists(spark, f"{loc}.patient_claims")
    save_as_table(claims, f"{loc}.patient_claims")
    n_claims = spark.table(
        "hls_healthcare_hls_dev.patient_claims"
    ).count()
    assert n_claims == N_BUNDLES  # one claim (two items) per bundle

    # -- 4. medications via the schema-override surface ----------------
    meds = medication_requests(entry)
    assert meds.count() == 3 * N_BUNDLES  # v15: 3-exposure refill history
    assert meds.where(col("rx_text").isNull()).count() == 0

    # -- 5. dedupe-lookup: staging claims vs written claim table -------
    staging = claims.where(col("claim_id").isin(
        [f"cl-{k}" for k in range(0, N_BUNDLES, 2)]
    )).select(col("claim_id").alias("stg_claim_id"))
    flag = staging.join(
        spark.table("hls_healthcare_hls_dev.patient_claims").select(
            "claim_id"
        ),
        staging.stg_claim_id == col("claim_id"),
        "left_outer",
    ).select(
        "stg_claim_id",
        F.when(col("claim_id").isNotNull(), "Y").otherwise("N").alias(
            "record_exists_flag"
        ),
    )
    got = flag.groupBy("record_exists_flag").count().collect()
    assert {(r[0], r[1]) for r in got} == {("Y", N_BUNDLES // 2)}

    # -- 6. ADT feed: entry → per-resource tables → timeline SQL -------
    adt = read_from_directory(ADT_DIR, spark=spark)
    adt_entry = adt.entry()
    assert adt_entry.count() == 4
    for t in ("Patient", "MessageHeader"):
        drop_table_if_exists(spark, f"{loc}.{t}")
    bulk_table_write(
        adt_entry, loc, write_mode="overwrite",
        columns=["Patient", "MessageHeader"],
    )
    # reconstruct the notebook's bundleUUID join over the WRITTEN
    # tables, then run the same timeline (get_action SQL UDF inside)
    p_tab = spark.table("hls_healthcare_hls_dev.Patient")
    mh_tab = spark.table("hls_healthcare_hls_dev.MessageHeader").select(
        "bundleUUID", "timestamp", "MessageHeader"
    )
    rejoined = p_tab.select("bundleUUID", "Patient").join(
        mh_tab, "bundleUUID"
    )
    from_tables = adt_events(rejoined)
    direct = adt_events(adt_entry)
    assert sorted(map(tuple, from_tables.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert from_tables.count() == 4

    # -- 7. OMOP person CTAS -------------------------------------------
    drop_table_if_exists(spark, f"{loc}.OMOP_PERSON")
    save_as_table(omop_person(entry), f"{loc}.OMOP_PERSON")
    assert spark.table(
        "hls_healthcare_hls_dev.OMOP_PERSON"
    ).count() == N_BUNDLES

    # -- 8. derived era over the WRITTEN occurrence table ---------------
    # the production sequence: land the occurrence table first, derive
    # eras from the TABLE (not from the source bundles) — _era_merge is
    # the shared core, so table-fed and entry-fed eras must be equal
    # (non-trivial here: the corpus gives every patient a 3-refill
    # history whose gaps straddle the 30-day window)
    from interop_spark.fhir.analytics import (
        _era_merge,
        omop_drug_era,
        omop_drug_exposure,
    )

    drop_table_if_exists(spark, f"{loc}.OMOP_DRUG_EXPOSURE")
    save_as_table(omop_drug_exposure(entry), f"{loc}.OMOP_DRUG_EXPOSURE")
    occ = spark.table("hls_healthcare_hls_dev.OMOP_DRUG_EXPOSURE")
    assert occ.count() == 3 * N_BUNDLES  # the refill history landed
    era_from_table = _era_merge(
        occ.select(
            "person_id",
            "drug_concept_code",
            F.to_date("drug_exposure_start_date").alias("d"),
        ),
        "drug_concept_code",
        "drug",
        "drug_exposure_count",
        30,
    )
    t_rows = sorted(map(tuple, era_from_table.collect()))
    d_rows = sorted(map(tuple, omop_drug_era(entry).collect()))
    assert t_rows == d_rows and len(t_rows) > 0
    # at least one patient's refills actually merged into a multi-
    # exposure era (the corpus guarantees straddling gaps)
    assert any(r[-1] > 1 for r in t_rows)

    # -- 9. cohort over the WRITTEN occurrence tables -------------------
    # the full OMOP shop sequence: ingest → land condition/drug
    # occurrence tables → select the cohort FROM THE TABLES (the
    # analytic the CDM exists for), asserting table-fed equals
    # entry-fed and that the temporal window genuinely filters
    from interop_spark.fhir import read_from_ndjson
    from interop_spark.fhir.analytics import (
        omop_cohort,
        omop_condition_occurrence,
    )
    from interop_spark.fhir.gen import write_ndjson_corpus

    drop_table_if_exists(spark, f"{loc}.OMOP_CONDITION_OCCURRENCE")
    save_as_table(
        omop_condition_occurrence(entry),
        f"{loc}.OMOP_CONDITION_OCCURRENCE",
    )
    co_tab = spark.table("hls_healthcare_hls_dev.OMOP_CONDITION_OCCURRENCE")
    assert co_tab.count() == N_BUNDLES
    nd_dir = write_ndjson_corpus(spark, sf_dir, max_custkey=N_BUNDLES)
    vs_codes = (
        read_from_ndjson(
            "file://" + nd_dir, spark=spark, glob_filter="*.ndjson"
        )
        .resource("ValueSet")
        .select(F.explode("compose.include").alias("inc"))
        .select(F.explode("inc.concept").alias("vc"))
        .select(col("vc.code").alias("condition_concept_code"))
        .distinct()
    )
    cohort_tables = omop_cohort(co_tab, occ, vs_codes)
    cohort_entry = omop_cohort(
        omop_condition_occurrence(entry), omop_drug_exposure(entry),
        vs_codes,
    )
    c_rows = sorted(map(tuple, cohort_tables.collect()))
    assert c_rows == sorted(map(tuple, cohort_entry.collect()))
    # the ValueSet and the 1500-day window both bite: some persons
    # qualify, not all ValueSet-matched persons do
    n_vs_persons = (
        co_tab.join(F.broadcast(vs_codes), "condition_concept_code")
        .select("person_id")
        .distinct()
        .count()
    )
    assert 0 < len(c_rows) < n_vs_persons

    # -- 10. writer roundtrip (df → FHIR JSON → re-parse) ---------------
    from interop_spark.queries.fhir_queries import q_fhir_writer_roundtrip

    rt = q_fhir_writer_roundtrip(spark, sf_dir)
    n_src = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(col("c_custkey") < 50)
        .count()
    )
    assert rt.count() == n_src > 0

    # -- 11. visit_detail from the r15 ext corpus, landed + re-read -----
    # the r15 CDM addition joins the same land-then-analyze sequence:
    # schema-override read → visit_detail mapping → table sink → the
    # segments-per-visit rollup over the WRITTEN table equals the
    # closed form (every encounter carries 1 + k % 3 ward segments)
    from interop_spark.queries.fhir_queries import q_fhir_omop_visit_detail

    drop_table_if_exists(spark, f"{loc}.OMOP_VISIT_DETAIL")
    save_as_table(
        q_fhir_omop_visit_detail(spark, sf_dir), f"{loc}.OMOP_VISIT_DETAIL"
    )
    vd_tab = spark.table("hls_healthcare_hls_dev.OMOP_VISIT_DETAIL")
    custkeys = [
        r.c_custkey
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(col("c_custkey") < 400)
        .select("c_custkey")
        .collect()
    ]
    assert vd_tab.count() == sum(1 + k % 3 for k in custkeys)
    per_visit = (
        vd_tab.groupBy("visit_occurrence_id")
        .agg(F.count(F.lit(1)).alias("n_segments"))
    )
    assert per_visit.count() == len(custkeys)
    assert set(
        r.n_segments for r in per_visit.collect()
    ) == {1, 2, 3}

    # -- 12. fact_relationship from the r15b ext corpus, landed +
    # re-read: aliquot chain → bidirectional CDM rows → table sink →
    # the re-read table must be direction-symmetric (every child-of
    # fact has its parent-of mirror) and sized 2x the closed-form
    # parent-reference count (a0 for every k, a1 for even k)
    from interop_spark.queries.fhir_queries import (
        q_fhir_omop_fact_relationship,
    )

    drop_table_if_exists(spark, f"{loc}.OMOP_FACT_RELATIONSHIP")
    save_as_table(
        q_fhir_omop_fact_relationship(spark, sf_dir),
        f"{loc}.OMOP_FACT_RELATIONSHIP",
    )
    fr_tab = spark.table("hls_healthcare_hls_dev.OMOP_FACT_RELATIONSHIP")
    n_refs = sum(1 + (1 if k % 2 == 0 else 0) for k in custkeys)
    assert fr_tab.count() == 2 * n_refs
    fwd = fr_tab.where(col("relationship_concept") == "child of").select(
        col("fact_id_1").alias("a"), col("fact_id_2").alias("b")
    )
    rev = fr_tab.where(col("relationship_concept") == "parent of").select(
        col("fact_id_2").alias("a"), col("fact_id_1").alias("b")
    )
    assert fwd.exceptAll(rev).count() == 0 and rev.exceptAll(fwd).count() == 0

    # -- 13. EPISODE from the main NDJSON corpus, landed + re-read:
    # the two-level gap-and-island output must conserve its inputs —
    # every (person, code)'s episode_event_count sums to the 3
    # recorded occurrences, era_count never exceeds event count, and
    # episode intervals for one (person, code) never overlap (the
    # level-2 merge invariant)
    from interop_spark.queries.fhir_queries import q_fhir_omop_episode

    drop_table_if_exists(spark, f"{loc}.OMOP_EPISODE")
    save_as_table(q_fhir_omop_episode(spark, sf_dir), f"{loc}.OMOP_EPISODE")
    ep_tab = spark.table("hls_healthcare_hls_dev.OMOP_EPISODE")
    per_pc = ep_tab.groupBy("person_id", "episode_concept_code").agg(
        F.sum("episode_event_count").alias("n_events"),
        F.sum("era_count").alias("n_eras"),
    )
    assert per_pc.count() == len(custkeys)
    assert per_pc.where(col("n_events") != 3).count() == 0
    assert ep_tab.where(col("era_count") > col("episode_event_count")).count() == 0
    # no overlapping episodes within a (person, code): count self-join
    # pairs whose intervals intersect with different episode numbers
    a = ep_tab.select(
        "person_id", "episode_concept_code",
        col("episode_number").alias("na"),
        col("episode_start_date").alias("sa"),
        col("episode_end_date").alias("ea"),
    )
    b = ep_tab.select(
        "person_id", "episode_concept_code",
        col("episode_number").alias("nb"),
        col("episode_start_date").alias("sb"),
        col("episode_end_date").alias("eb"),
    )
    overlaps = a.join(b, ["person_id", "episode_concept_code"]).where(
        (col("na") < col("nb")) & (col("sa") <= col("eb")) & (col("sb") <= col("ea"))
    )
    assert overlaps.count() == 0
