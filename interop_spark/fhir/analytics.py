"""Named FHIR analytics — the reference notebook's flattening/join queries
re-expressed as DataFrame functions over the bundle-row ``entry()`` frame.

Each function mirrors one notebook query (citations into
`/root/reference/01_dbignite_sample.py`) and returns the same column
surface. All are pure Column expressions: explode → nested pluck → join on
``bundleUUID`` — Catalyst prunes the untouched resource columns out of the
scan, which is what makes these viable on 100 TB of bundles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, explode

from interop_spark.fhir.adt import get_action


def _explode2(
    entry_df: DataFrame,
    arr_a: str,
    alias_a: str,
    arr_b: str,
    alias_b: str,
    extra: list[str] | None = None,
) -> DataFrame:
    """Within-bundle cross product of two resource arrays as SEQUENTIAL
    explodes over one scan — the shuffle-free, single-parse replacement
    for joining two separately-exploded frames on bundleUUID (both
    arrays are columns of the same entry row; an equi-self-join re-parses
    the source once per side and exchanges what never left the row)."""
    keep = ["bundleUUID", *(extra or [])]
    return entry_df.select(
        *keep, explode(arr_a).alias(alias_a), col(arr_b)
    ).select(*keep, alias_a, explode(arr_b).alias(alias_b))


def _first(c):
    """ANSI-safe element 0 (Spark 4 defaults to ANSI mode, where [0] on an
    empty array raises INVALID_ARRAY_INDEX; get() returns NULL)."""
    return F.get(c, 0)


def patient_conditions(entry_df: DataFrame) -> DataFrame:
    """Patient × Condition within a bundle (`01_dbignite_sample.py:47-72`).

    Intentional normalization vs the reference: ``condition_description``
    is ``code.coding[0].display`` (always populated in coded data) where
    the reference projects ``Condition.code.text`` (free text, often
    absent in coded sources). Swap the expression if text-fidelity to the
    notebook matters more than coverage.

    Plan shape: the reference joins two exploded frames on bundleUUID —
    but both arrays live in the SAME entry row, so the within-bundle
    cross product is two SEQUENTIAL explodes in one projection: no
    shuffle, and (decisively for the file-corpus path) ONE evaluation of
    the variant-parse subtree instead of one per join side. Inner
    ``explode`` drops bundles missing either resource, exactly like the
    inner join did."""
    return _explode2(entry_df, "Patient", "patient", "Condition", "condition").select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("patient.id").alias("Patient"),
        col("patient.birthDate").alias("Birth_date"),
        _first(col("condition.clinicalStatus.coding.code")).alias("clinical_status"),
        _first(col("condition.code.coding.code")).alias("condition_code"),
        _first(col("condition.code.coding.system")).alias("condition_type_code"),
        _first(col("condition.code.coding.display")).alias("condition_description"),
        col("condition.recordedDate").alias("condition_date"),
    )


def patient_claims(entry_df: DataFrame) -> DataFrame:
    """Patient × Claim within a bundle (`01_dbignite_sample.py:82-112`).

    Note the field-pluck-over-array semantics: ``claim.item.productOrService
    .coding.display`` stays array-valued (P3, `:91-93`).

    Intentional normalizations vs the reference: ``claim_patient_id`` and
    ``insurer`` project the ``.reference`` STRING out of the FHIR
    Reference struct (the reference returns the whole struct), and the
    ``prcdr_*`` columns flatten the item[] × coding[] array-of-array to
    ``array<string>`` (the reference yields the nested form). Flat scalar/
    array columns join and aggregate directly; drop ``.reference`` /
    ``F.flatten`` to recover the reference's exact shapes. Plan shape:
    sequential explodes, not a bundleUUID self-join (see
    ``patient_conditions``)."""
    return _explode2(entry_df, "Patient", "patient", "Claim", "claim").select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("patient.id").alias("Patient"),
        col("claim.patient.reference").alias("claim_patient_id"),
        col("claim.id").alias("claim_id"),
        col("patient.birthDate").alias("Birth_date"),
        _first(col("claim.type.coding.code")).alias("claim_type_cd"),
        _first(col("claim.insurance.coverage.reference")).alias("insurer"),
        col("claim.total.value").alias("claim_billed_amount"),
        # item[] × coding[] is array-of-array — pluck via transform+flatten
        F.flatten(
            F.transform(
                col("claim.item"),
                lambda it: it["productOrService"]["coding"]["display"],
            )
        ).alias("prcdr_description"),
        F.flatten(
            F.transform(
                col("claim.item"),
                lambda it: it["productOrService"]["coding"]["code"],
            )
        ).alias("prcdr_cd"),
        F.flatten(
            F.transform(
                col("claim.item"),
                lambda it: it["productOrService"]["coding"]["system"],
            )
        ).alias("prcdr_coding_system"),
    )


def medication_requests(entry_df: DataFrame) -> DataFrame:
    """Patient × MedicationRequest (`01_dbignite_sample.py:151-174`); requires
    the medicationCodeableConcept schema override (`:118-146`). Plan
    shape: sequential explodes (see ``patient_conditions``)."""
    return _explode2(
        entry_df, "Patient", "patient", "MedicationRequest", "med"
    ).select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("patient.id").alias("Patient"),
        col("med.status").alias("status"),
        col("med.intent").alias("intent"),
        col("med.authoredOn").alias("authoredOn"),
        col("med.medicationCodeableConcept.text").alias("rx_text"),
        _first(col("med.medicationCodeableConcept.coding.code")).alias("rx_code"),
        _first(col("med.medicationCodeableConcept.coding.system")).alias("code_type"),
    )


def providers_practitioners(entry_df: DataFrame) -> DataFrame:
    """Practitioner contact-point flattening (`01_dbignite_sample.py:186-206`)."""
    pr = entry_df.select(
        col("bundleUUID"), explode("Practitioner").alias("practitioner")
    )
    return pr.select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("practitioner.active").alias("active"),
        col("practitioner.gender").alias("gender"),
        _first(col("practitioner.telecom.system")).alias("primary_contact_method"),
        _first(col("practitioner.telecom.value")).alias("primary_contact_value"),
        _first(col("practitioner.telecom.use")).alias("primary_use"),
    )


def adt_events(entry_df: DataFrame, limit: int | None = 10) -> DataFrame:
    """The ADT patient/action timeline (`01_dbignite_sample.py:431-459`):
    MessageHeader × Patient joined on bundleUUID, identifier-system
    extraction via higher-order ``filter``, ``get_action`` enrichment,
    ordered ssn desc / timestamp desc. Plan shape: sequential explodes
    over one scan (see ``patient_conditions``), carrying ``timestamp``
    through."""
    flat = _explode2(
        entry_df, "MessageHeader", "messageheader", "Patient", "patient",
        extra=["timestamp"],
    )
    ssn = _first(F.filter(
        col("patient.identifier"),
        lambda x: x["system"] == "http://hl7.org/fhir/sid/us-ssn",
    ))["value"]
    dl = _first(F.filter(
        col("patient.identifier"),
        lambda x: F.get(x["type"]["coding"], 0)["code"] == "DL",
    ))["value"]
    empi = _first(F.filter(
        col("patient.identifier"), lambda x: x["type"]["text"] == "EMPI"
    ))["value"]
    action = get_action(col("messageheader.eventCoding.code"))
    out = (
        flat
        .select(
            ssn.alias("ssn"),
            col("timestamp").alias("event_timestamp"),
            col("messageheader.eventCoding.code").alias("adt_type"),
            action["action"].alias("action"),
            action["description"].alias("description"),
            col("messageheader.eventCoding.code").alias("code"),
            col("messageheader.eventCoding.system").alias("system"),
            F.get(_first(col("patient.name"))["given"], 0).alias("first_name"),
            _first(col("patient.name"))["family"].alias("last_name"),
            col("patient.birthDate").alias("birthDate"),
            col("patient.gender").alias("gender"),
            dl.alias("drivers_license_id"),
            empi.alias("empi_id"),
        )
        .orderBy(col("ssn").desc(), col("event_timestamp").desc())
    )
    return out.limit(limit) if limit else out


def omop_person(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM person projection (`01_dbignite_sample.py:472-484`)."""
    p = entry_df.select(col("bundleUUID"), explode("Patient").alias("patient"))
    return p.select(
        col("patient.id").alias("person_id"),
        col("patient.name").alias("name"),
        col("patient.gender").alias("gender_source_value"),
        F.year(F.to_date(col("patient.birthDate"))).alias("year_of_birth"),
        F.month(F.to_date(col("patient.birthDate"))).alias("month_of_birth"),
        F.dayofmonth(F.to_date(col("patient.birthDate"))).alias("day_of_birth"),
        col("patient.address").alias("patient_address"),
    )


def patient_observations(entry_df: DataFrame) -> DataFrame:
    """Patient × Observation within a bundle — the Synthea-type analog of
    ``patient_conditions`` (the reference's demo dataset contains
    Observation bundles, reference README.md:31, but its notebook never
    flattens them; same explode → pluck shape, `01_dbignite_sample
    .py:47-72`; sequential explodes, not a bundleUUID self-join)."""
    return _explode2(
        entry_df, "Patient", "patient", "Observation", "obs"
    ).select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("patient.id").alias("Patient"),
        col("obs.status").alias("obs_status"),
        _first(col("obs.code.coding.code")).alias("obs_code"),
        _first(col("obs.code.coding.system")).alias("obs_code_system"),
        col("obs.valueQuantity.value").alias("obs_value"),
        col("obs.valueQuantity.unit").alias("obs_unit"),
        col("obs.effectiveDateTime").alias("effective_date"),
    )


def condition_text(entry_df: DataFrame) -> DataFrame:
    """Text-fidelity Condition projection: the reference projects
    ``Condition.code.text`` (free text, `01_dbignite_sample.py:52`) where
    ``patient_conditions`` normalizes to ``coding[0].display``; this
    variant carries BOTH so the fidelity choice is the caller's."""
    c = entry_df.select(
        col("bundleUUID"), explode("Condition").alias("condition")
    )
    return c.select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("condition.id").alias("condition_id"),
        _first(col("condition.code.coding.code")).alias("condition_code"),
        col("condition.code.text").alias("condition_text"),
        _first(col("condition.code.coding.display")).alias(
            "condition_description"
        ),
    )


def diagnostic_reports(entry_df: DataFrame) -> DataFrame:
    """Patient × DiagnosticReport within a bundle — the round-10 deep-
    schema query for the lab-report type real Synthea corpora carry
    (reference README.md:31 names DiagnosticReport bundles; flatten
    shape per `01_dbignite_sample.py:47-72`). Sequential explodes over
    one scan, no bundleUUID self-join."""
    return _explode2(
        entry_df, "Patient", "patient", "DiagnosticReport", "dx"
    ).select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("patient.id").alias("Patient"),
        col("dx.id").alias("report_id"),
        col("dx.status").alias("report_status"),
        _first(col("dx.code.coding.code")).alias("report_code"),
        _first(col("dx.code.coding.system")).alias("report_code_system"),
        col("dx.effectiveDateTime").alias("effective_date"),
        col("dx.conclusion").alias("conclusion"),
        _first(col("dx.result.reference")).alias("first_result_ref"),
    )


def questionnaire_answers(entry_df: DataFrame) -> DataFrame:
    """QuestionnaireResponse item/answer flattening — exercises the
    round-10 promotion of QuestionnaireResponse from DomainResource
    spine to a full element tree (repeated item[] with answer[]
    value[x] choice leaves; schema-extension surface per
    `01_dbignite_sample.py:123-146`). One row per (response, item):
    explode the resource array, then the item array; answers are
    plucked from the first answer element (the generator emits one
    answer per item, value[x]-style)."""
    qr = entry_df.select(
        col("bundleUUID"), explode("QuestionnaireResponse").alias("qr")
    )
    items = qr.select(
        col("bundleUUID").alias("UNIQUE_FHIR_ID"),
        col("qr.id").alias("response_id"),
        col("qr.status").alias("response_status"),
        col("qr.questionnaire").alias("questionnaire"),
        col("qr.authored").alias("authored"),
        explode("qr.item").alias("item"),
    )
    first_answer = _first(col("item.answer"))
    return items.select(
        "UNIQUE_FHIR_ID",
        "response_id",
        "response_status",
        "questionnaire",
        "authored",
        col("item.linkId").alias("link_id"),
        col("item.text").alias("question_text"),
        first_answer["valueInteger"].alias("answer_integer"),
        first_answer["valueString"].alias("answer_string"),
    )


def omop_condition_occurrence(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM condition_occurrence projection — extends the reference's
    person-only OMOP mapping (`01_dbignite_sample.py:472-484`) to the
    next CDM table a real ETL lands: one row per Condition, person-keyed
    via the within-bundle Patient (sequential explodes, one scan)."""
    return _explode2(
        entry_df, "Patient", "patient", "Condition", "condition"
    ).select(
        col("condition.id").alias("condition_occurrence_id"),
        col("patient.id").alias("person_id"),
        _first(col("condition.code.coding.code")).alias(
            "condition_concept_code"
        ),
        _first(col("condition.code.coding.system")).alias(
            "condition_vocabulary"
        ),
        col("condition.code.text").alias("condition_source_value"),
        col("condition.recordedDate").alias("condition_start_date"),
        _first(col("condition.clinicalStatus.coding.code")).alias(
            "condition_status_source_value"
        ),
    )


def omop_visit_occurrence(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM visit_occurrence projection from Encounter — the CDM
    table every cohort query joins for care-setting context (extends
    the reference's person-only mapping, `01_dbignite_sample.py:472-484`).
    Encounter.class is a bare R4 Coding (not a CodeableConcept), so the
    concept code plucks directly, no array hop. Dates stay 'YYYY-MM-DD'
    strings end-to-end (engine-neutral compare)."""
    return _explode2(
        entry_df, "Patient", "patient", "Encounter", "enc"
    ).select(
        col("enc.id").alias("visit_occurrence_id"),
        col("patient.id").alias("person_id"),
        col("enc.class.code").alias("visit_concept_code"),
        col("enc.class.display").alias("visit_source_value"),
        col("enc.period.start").alias("visit_start_date"),
        col("enc.period.end").alias("visit_end_date"),
        col("enc.status").alias("visit_status_source_value"),
    )


def omop_procedure_occurrence(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM procedure_occurrence projection from Procedure (CPT
    coded with free-text source value; performedDateTime is the R4
    performed[x] choice the generator emits)."""
    return _explode2(
        entry_df, "Patient", "patient", "Procedure", "prc"
    ).select(
        col("prc.id").alias("procedure_occurrence_id"),
        col("patient.id").alias("person_id"),
        _first(col("prc.code.coding.code")).alias("procedure_concept_code"),
        _first(col("prc.code.coding.system")).alias("procedure_vocabulary"),
        col("prc.code.text").alias("procedure_source_value"),
        col("prc.performedDateTime").alias("procedure_date"),
        col("prc.status").alias("procedure_status_source_value"),
    )


def omop_measurement(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM measurement projection from Observation (LOINC code,
    valueQuantity numeric + unit) — the lab/vitals table, completing
    the person/condition/drug/visit/procedure CDM core."""
    return _explode2(
        entry_df, "Patient", "patient", "Observation", "obs"
    ).select(
        col("obs.id").alias("measurement_id"),
        col("patient.id").alias("person_id"),
        _first(col("obs.code.coding.code")).alias("measurement_concept_code"),
        _first(col("obs.code.coding.system")).alias("measurement_vocabulary"),
        col("obs.effectiveDateTime").alias("measurement_date"),
        col("obs.valueQuantity.value").alias("value_as_number"),
        col("obs.valueQuantity.unit").alias("unit_source_value"),
    )


def omop_death(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM death projection from ``Patient.deceased[x]`` (choice
    type: ``deceasedDateTime`` gives a dated row; a bare
    ``deceasedBoolean=true`` gives a row with NULL death_date — death
    known, date unknown — which is how a real FHIR→OMOP ETL lands the
    choice). Patients with no deceased indication emit no row.
    death_type_concept_id 32817 = "EHR" (OMOP standard vocabulary).
    Scale: one explode + filter, no shuffle at all."""
    p = entry_df.select(explode("Patient").alias("p"))
    return p.where(
        (col("p.deceasedBoolean") == F.lit(True))
        | col("p.deceasedDateTime").isNotNull()
    ).select(
        col("p.id").alias("person_id"),
        F.substring(col("p.deceasedDateTime"), 1, 10).alias("death_date"),
        F.lit(32817).alias("death_type_concept_id"),
    )


def omop_observation_period(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM observation_period: the [min, max] clinical-event date
    span per person, derived from the dated clinical resources
    (Condition.recordedDate, Encounter.period bounds,
    Procedure.performedDateTime, MedicationRequest.authoredOn,
    Observation/DiagnosticReport.effectiveDateTime) — the aggregate a
    real FHIR→OMOP ETL runs last, once the event tables are mapped.
    period_type_concept_id 44814724 = "Period covering healthcare
    encounters" (OMOP standard vocabulary).

    Scale shape: each source explodes to a narrow (person_id, date)
    pair — Catalyst prunes every other resource column before the
    union — and partial min/max aggregation collapses each map task to
    at most one row per person BEFORE the single person-keyed
    shuffle."""
    srcs = (
        ("Condition", "subject", ["recordedDate"]),
        ("Encounter", "subject", ["period.start", "period.end"]),
        ("Procedure", "subject", ["performedDateTime"]),
        ("MedicationRequest", "subject", ["authoredOn"]),
        ("Observation", "subject", ["effectiveDateTime"]),
        ("DiagnosticReport", "subject", ["effectiveDateTime"]),
    )
    parts = []
    for rt, subj, dates in srcs:
        r = entry_df.select(explode(rt).alias("r"))
        parts.append(
            r.select(
                F.substring_index(
                    col(f"r.{subj}.reference"), "/", -1
                ).alias("person_id"),
                F.explode(
                    F.array(*[F.substring(col(f"r.{d}"), 1, 10) for d in dates])
                ).alias("event_date"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return (
        u.where(col("event_date").isNotNull())
        .groupBy("person_id")
        .agg(
            F.min("event_date").alias("observation_period_start_date"),
            F.max("event_date").alias("observation_period_end_date"),
        )
        .select(
            "person_id",
            "observation_period_start_date",
            "observation_period_end_date",
            F.lit(44814724).alias("period_type_concept_id"),
        )
    )


def omop_provider(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM provider projection from Practitioner: NPI (the
    us-npi-system identifier, extracted with a higher-order ``filter``
    like the reference's SSN idiom, `01_dbignite_sample.py:440-444`),
    name, specialty source (first qualification code) and gender.
    Completes the CDM's health-system domain beside the clinical core.
    Scale: one explode, per-row HOF projections, no shuffle at all."""
    pr = entry_df.select(explode("Practitioner").alias("pr"))
    npi = F.filter(
        col("pr.identifier"),
        lambda i: i["system"] == "http://hl7.org/fhir/sid/us-npi",
    )
    return pr.select(
        col("pr.id").alias("provider_id"),
        _first(col("pr.name.text")).alias("provider_name"),
        _first(npi["value"]).alias("npi"),
        _first(_first(col("pr.qualification.code"))["coding"])[
            "code"
        ].alias("specialty_source_value"),
        col("pr.gender").alias("gender_source_value"),
    )


def omop_drug_exposure(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM drug_exposure projection from MedicationRequest (requires
    the medicationCodeableConcept schema extension, the reference's own
    override surface `01_dbignite_sample.py:118-146`)."""
    return _explode2(
        entry_df, "Patient", "patient", "MedicationRequest", "mr"
    ).select(
        col("mr.id").alias("drug_exposure_id"),
        col("patient.id").alias("person_id"),
        _first(col("mr.medicationCodeableConcept.coding.code")).alias(
            "drug_concept_code"
        ),
        col("mr.medicationCodeableConcept.text").alias("drug_source_value"),
        col("mr.authoredOn").alias("drug_exposure_start_date"),
        col("mr.status").alias("drug_status_source_value"),
    )


def _era_merge(
    occurrences: DataFrame,
    concept_col: str | list[str],
    prefix: str,
    count_alias: str,
    persistence_days: int,
) -> DataFrame:
    """Shared gap-and-island core of the OMOP ``*_era`` tables:
    contiguous occurrence rows for one (person, concept) merge into an
    era whenever the gap between successive dates is at most the OMOP
    persistence window — the standard derivation every CDM ETL runs
    after the occurrence tables land. ``concept_col`` may be a list for
    composite era keys (dose_era eras are per (drug, dose value, dose
    unit) — a dose change splits the era even with no gap). Input:
    (person_id, <concept cols>, d::date); output: era intervals named
    ``{prefix}_era_start_date`` / ``{prefix}_era_end_date`` /
    ``{count_alias}``.

    Scale shape: ONE exchange end-to-end. Both window functions (lag
    for the gap flag, running sum for the era id) share the
    (person, concept) partitioning and date ordering, so they reuse a
    single sort; the final groupBy keys (person, concept, era) are a
    superset of the window partition keys, so HashPartitioning(person,
    concept) already satisfies its clustering and no second shuffle is
    planned (plan-asserted in tests/test_scale.py)."""
    from pyspark.sql.window import Window

    concept_cols = (
        [concept_col] if isinstance(concept_col, str) else list(concept_col)
    )
    w = Window.partitionBy("person_id", *concept_cols).orderBy("d")
    flagged = occurrences.withColumn(
        "new_era",
        F.when(
            F.datediff(col("d"), F.lag("d").over(w)) > persistence_days, 1
        ).otherwise(0),  # first row: datediff(NULL) is NULL -> 0
    )
    eras = flagged.withColumn(
        "era_seq",
        (
            F.sum("new_era").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            + 1
        ).cast("int"),
    )
    return eras.groupBy("person_id", *concept_cols, "era_seq").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias(
            f"{prefix}_era_start_date"
        ),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias(
            f"{prefix}_era_end_date"
        ),
        F.count(F.lit(1)).cast("long").alias(count_alias),
    )


def omop_drug_era(
    entry_df: DataFrame, persistence_days: int = 30
) -> DataFrame:
    """OMOP CDM drug_era over drug_exposure (30-day persistence window;
    extends the reference's person-only OMOP mapping,
    `01_dbignite_sample.py:472-484`). Gap-and-island core + scale shape:
    see ``_era_merge`` (shared with ``omop_condition_era``)."""
    e = omop_drug_exposure(entry_df).select(
        "person_id",
        "drug_concept_code",
        F.to_date("drug_exposure_start_date").alias("d"),
    )
    return _era_merge(
        e, "drug_concept_code", "drug", "drug_exposure_count",
        persistence_days,
    )


def omop_condition_era(
    entry_df: DataFrame, persistence_days: int = 30
) -> DataFrame:
    """OMOP CDM condition_era over condition_occurrence — the same
    gap-and-island merge as drug_era (OMOP specifies a 30-day
    persistence window for conditions too), via the shared
    ``_era_merge`` core."""
    e = omop_condition_occurrence(entry_df).select(
        "person_id",
        "condition_concept_code",
        F.to_date("condition_start_date").alias("d"),
    )
    return _era_merge(
        e, "condition_concept_code", "condition",
        "condition_occurrence_count", persistence_days,
    )


def omop_device_exposure(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM device_exposure from the DeviceUseStatement → Device
    pair: the use statement carries the person and the wear interval,
    the referenced Device carries the concept (SNOMED type) and the
    UDI — so the mapping RESOLVES the within-bundle device reference
    (``dus.device.reference == 'Device/' || dev.id``) instead of
    trusting co-location, the way a real FHIR→OMOP ETL lands it.

    Scale shape: sequential explodes over one scan (within-bundle
    cross product) with the reference-equality filter applied before
    the projection — no shuffle at all; Catalyst prunes every other
    resource column out of the parse."""
    pairs = _explode2(
        entry_df, "DeviceUseStatement", "dus", "Device", "dev"
    ).where(
        col("dus.device.reference")
        == F.concat(F.lit("Device/"), col("dev.id"))
    )
    return pairs.select(
        col("dus.id").alias("device_exposure_id"),
        F.regexp_replace(
            col("dus.subject.reference"), "^Patient/", ""
        ).alias("person_id"),
        _first(col("dev.type.coding.code")).alias("device_concept_code"),
        _first(col("dev.udiCarrier.deviceIdentifier")).alias(
            "unique_device_id"
        ),
        col("dus.timingPeriod.start").alias("device_exposure_start_date"),
        col("dus.timingPeriod.end").alias("device_exposure_end_date"),
        col("dus.status").alias("device_status_source_value"),
    )


def reference_integrity(
    entry_df: DataFrame,
    checks: list[tuple[str, str, str]],
) -> DataFrame:
    """Cross-resource REFERENCE-INTEGRITY audit: for each
    ``(source_type, ref_path, target_type)`` check, resolve every
    ``Type/id`` reference the corpus carries against the ids actually
    present — the first data-quality pass a real FHIR ETL runs (the
    reference's own claim→coverage lookup idiom,
    `01_dbignite_sample.py:384-397`, generalized). One row per check:
    total refs, resolved, dangling.

    ``ref_path`` is a dotted path inside the exploded source resource
    (``subject.reference``, ``schedule.reference``); array hops are not
    supported here — pre-explode shapes belong in dedicated queries.

    Scale shape: per check, the source side projects to ONE string
    column before the join; the target side is a distinct-id frame
    (bounded by the resource population, typically broadcastable after
    distinct); the final aggregate is a single row per check, unioned.
    Catalyst prunes every untouched resource column from the scan."""
    parts = []
    for src_type, ref_path, tgt_type in checks:
        refs = entry_df.select(explode(src_type).alias("r")).select(
            col(f"r.{ref_path}").alias("ref")
        ).where(col("ref").isNotNull())
        ids = (
            entry_df.select(explode(tgt_type).alias("t"))
            .select(
                F.concat(F.lit(tgt_type), F.lit("/"), col("t.id")).alias(
                    "ref"
                )
            )
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        parts.append(
            refs.join(ids, "ref", "left_outer").agg(
                F.lit(src_type).alias("source_type"),
                F.lit(tgt_type).alias("target_type"),
                F.count(F.lit(1)).cast("long").alias("n_refs"),
                F.sum(F.coalesce(col("_hit"), F.lit(0)))
                .cast("long")
                .alias("n_resolved"),
                F.sum(F.when(col("_hit").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_dangling"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


OMOP_OPEN_END = "2099-12-31"  # open-ended plan sentinel (no period.end)


def omop_payer_plan_period(coverage_df: DataFrame) -> DataFrame:
    """OMOP CDM payer_plan_period projection from Coverage — the
    payer-domain interval table (person, payer, plan, validity dates).
    Source-agnostic: takes the typed Coverage frame whichever scan
    produced it (the driver row feeds it from the NDJSON bulk-export
    path, composing S6 with the OMOP family). Open-ended coverages
    (no ``period.end`` — active plans) are censored to the
    ``OMOP_OPEN_END`` sentinel, the CDM convention for
    still-in-force periods. Dates stay 'YYYY-MM-DD' strings
    end-to-end (driver date-type contract). One scan, zero shuffles —
    a pure typed projection."""
    return coverage_df.select(
        col("id").alias("payer_plan_period_id"),
        F.regexp_replace(col("beneficiary.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        col("period.start").alias("payer_plan_period_start_date"),
        F.coalesce(col("period.end"), F.lit(OMOP_OPEN_END)).alias(
            "payer_plan_period_end_date"
        ),
        F.get(col("payor"), 0)["reference"].alias("payer_source_value"),
        F.get(col("type.coding"), 0)["code"].alias("plan_source_value"),
        col("status").alias("status_source_value"),
    )


def omop_dose_era(
    mr_df: DataFrame, persistence_days: int = 30
) -> DataFrame:
    """OMOP CDM dose_era from a TYPED MedicationRequest frame (the
    NDJSON bulk-export path): eras are per (person, drug concept, dose
    value, dose unit) — the composite-key form of the shared
    ``_era_merge`` core, so a DOSE CHANGE splits the era even when the
    refill gap is inside the persistence window (the dose-escalation
    semantics the CDM specifies). Completes the OMOP era family
    (drug_era, condition_era, dose_era)."""
    e = mr_df.select(
        F.regexp_replace(col("subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        _first(col("medicationCodeableConcept.coding.code")).alias(
            "drug_concept_code"
        ),
        F.get(F.get(col("dosageInstruction"), 0)["doseAndRate"], 0)[
            "doseQuantity"
        ]["value"].alias("dose_value"),
        F.get(F.get(col("dosageInstruction"), 0)["doseAndRate"], 0)[
            "doseQuantity"
        ]["unit"].alias("dose_unit"),
        F.to_date("authoredOn").alias("d"),
    )
    return _era_merge(
        e,
        ["drug_concept_code", "dose_value", "dose_unit"],
        "dose",
        "dose_exposure_count",
        persistence_days,
    )


def omop_location(entry_df: DataFrame, zip_prefix: int = 3) -> DataFrame:
    """OMOP CDM location from Patient.address — the normalized address
    dimension person rows reference (completes the health-system domain
    beside provider/care_site; extends the reference's person-only
    mapping, `01_dbignite_sample.py:472-484`). ``zip`` is truncated to
    its ``zip_prefix``-digit prefix by default — the HIPAA Safe Harbor
    geographic generalization a de-identified CDM ships with.
    ``location_id`` is the deterministic md5 of the address tuple (the
    CDM uses a surrogate key; a content hash keeps it rerun- and
    engine-stable), and ``n_persons`` carries the denormalization count
    an ETL QA report wants.

    Scale shape: per-patient project → groupBy the address tuple.
    Partial aggregation collapses each map task to its distinct
    addresses before the single bounded-key shuffle (address
    cardinality ≪ person count; no person-keyed skew is possible)."""
    p = entry_df.select(explode("Patient").alias("patient")).select(
        F.get(col("patient.address"), 0).alias("a")
    )
    addr = p.select(
        col("a.city").alias("city"),
        col("a.state").alias("state"),
        F.substring(col("a.postalCode"), 1, zip_prefix).alias("zip"),
        col("a.country").alias("country"),
    )
    return addr.groupBy("city", "state", "zip", "country").agg(
        F.count(F.lit(1)).cast("long").alias("n_persons")
    ).select(
        F.md5(
            F.concat_ws("|", "city", "state", "zip", "country")
        ).alias("location_id"),
        "city",
        "state",
        "zip",
        "country",
        "n_persons",
    )


def omop_care_site(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM care_site (+ inline location columns, the
    pre-normalization join product a FHIR→OMOP ETL lands before
    splitting the CDM's care_site/location pair): Location resources
    give the site id/name/type/address/coordinates,
    ``managingOrganization`` joins the owning Organization's name in as
    ``care_site_source_value``.

    Scale shape: bundles re-ship their facility dimension, so both
    sides are exploded-then-distinct — the distinct collapses to the
    (small) facility cardinality before the join, and the Organization
    side broadcasts. The corpus-sized explode feeds a partial
    aggregate; no facility-keyed skew can exceed the number of
    facilities."""
    locs = (
        entry_df.select(explode("Location").alias("l"))
        .select(
            col("l.id").alias("care_site_id"),
            col("l.name").alias("care_site_name"),
            F.get(F.get(col("l.type"), 0)["coding"], 0)["code"].alias(
                "place_of_service_source_value"
            ),
            col("l.address.city").alias("location_city"),
            col("l.address.state").alias("location_state"),
            col("l.address.postalCode").alias("location_zip"),
            col("l.position.latitude").alias("latitude"),
            col("l.position.longitude").alias("longitude"),
            F.regexp_replace(
                col("l.managingOrganization.reference"),
                "^Organization/",
                "",
            ).alias("org_id"),
        )
        .distinct()
    )
    orgs = (
        entry_df.select(explode("Organization").alias("o"))
        .select(
            col("o.id").alias("org_id"),
            col("o.name").alias("care_site_source_value"),
        )
        .distinct()
    )
    return locs.join(F.broadcast(orgs), "org_id", "left").select(
        "care_site_id",
        "care_site_name",
        "place_of_service_source_value",
        "care_site_source_value",
        "location_city",
        "location_state",
        "location_zip",
        "latitude",
        "longitude",
    )


def omop_cost(entry_df: DataFrame) -> DataFrame:
    """OMOP CDM cost projection from Invoice (corpus v11 carries the
    Money totals and CPT-coded lineItem): one cost row per invoice,
    person from ``subject``, domain pinned by the charge code system
    (CPT → Procedure), charge/cost from totalGross/totalNet. The date
    stays a 'YYYY-MM-DD' string (driver date-type contract). Pure
    typed projection — one scan, zero shuffles."""
    inv = entry_df.select(explode("Invoice").alias("i"))
    li = F.get(col("i.lineItem"), 0)
    return inv.select(
        col("i.id").alias("cost_id"),
        F.regexp_replace(col("i.subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        F.lit("Procedure").alias("cost_domain_id"),
        col("i.date").alias("incurred_date"),
        col("i.totalGross.currency").alias("currency_source_value"),
        col("i.totalGross.value").alias("total_charge"),
        col("i.totalNet.value").alias("total_cost"),
        F.get(li["chargeItemCodeableConcept"]["coding"], 0)["code"].alias(
            "charge_source_value"
        ),
        col("i.status").alias("status_source_value"),
    )


def omop_observation(obs_df: DataFrame) -> DataFrame:
    """OMOP CDM observation projection — the DOMAIN SPLIT side of
    ``omop_measurement``: R4 Observations whose category is NOT
    laboratory / vital-signs (social history, surveys…) belong in the
    CDM observation table with the value landed as a CODED value
    (value_as_concept), not a number — the standard OMOP domain
    decision (extends the reference's person-only OMOP mapping,
    `01_dbignite_sample.py:470-484`). Takes the TYPED Observation frame
    (NDJSON scan or exploded bundle column), the
    ``omop_payer_plan_period`` calling convention.

    Scale shape: one scan, a category-membership filter evaluated on
    the pruned struct, pure projection — zero shuffles."""
    is_measurement = F.exists(
        col("category"),
        lambda cc: F.exists(
            cc["coding"],
            lambda cd: cd["code"].isin("laboratory", "vital-signs"),
        ),
    )
    return obs_df.where(
        col("category").isNotNull() & ~is_measurement
    ).select(
        col("id").alias("observation_id"),
        F.regexp_replace(col("subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        _first(col("code.coding.code")).alias("observation_concept_code"),
        _first(col("code.coding.system")).alias("observation_vocabulary"),
        F.substring(col("effectiveDateTime"), 1, 10).alias(
            "observation_date"
        ),
        _first(col("valueCodeableConcept.coding.code")).alias(
            "value_as_concept_code"
        ),
        _first(col("valueCodeableConcept.coding.display")).alias(
            "value_as_string"
        ),
        F.lit(32817).alias("observation_type_concept_id"),
    )


def omop_specimen(spec_df: DataFrame) -> DataFrame:
    """OMOP CDM specimen projection from the R4 Specimen resource:
    concept from ``type``, date from ``collection.collectedDateTime``,
    quantity/unit from ``collection.quantity`` — the biobank table that
    completes the CDM clinical-data story. Takes the TYPED Specimen
    frame (the ``omop_payer_plan_period`` calling convention). Pure
    typed projection — one scan, zero shuffles."""
    return spec_df.select(
        col("id").alias("specimen_id"),
        F.regexp_replace(col("subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        _first(col("type.coding.code")).alias("specimen_concept_code"),
        _first(col("type.coding.display")).alias("specimen_source_value"),
        F.substring(col("collection.collectedDateTime"), 1, 10).alias(
            "specimen_date"
        ),
        col("collection.quantity.value").alias("quantity"),
        col("collection.quantity.unit").alias("unit_source_value"),
        col("status").alias("status_source_value"),
    )


def omop_device_era(
    entry_df: DataFrame, persistence_days: int = 30
) -> DataFrame:
    """Device eras over ``omop_device_exposure`` — the same
    gap-and-island persistence-window merge as drug/condition/dose eras
    via the shared ``_era_merge`` core, keyed per (person, device
    concept). Scale shape: the exposure mapping is shuffle-free
    (within-bundle reference resolution), so the era derivation's ONE
    (person, concept)-keyed exchange is the whole cost — see
    ``_era_merge``."""
    e = omop_device_exposure(entry_df).select(
        "person_id",
        "device_concept_code",
        F.to_date("device_exposure_start_date").alias("d"),
    )
    return _era_merge(
        e, "device_concept_code", "device", "device_exposure_count",
        persistence_days,
    )


def omop_cohort(
    condition_occurrence: DataFrame,
    drug_exposure: DataFrame,
    vs_codes: DataFrame,
    window_days: int = 1500,
) -> DataFrame:
    """Cohort selection over CDM occurrence tables (round-13 logic,
    extracted round-14 so the e2e chain can run it over WRITTEN tables):
    persons whose condition code is in the ValueSet (``vs_codes``: one
    ``condition_concept_code`` column, broadcast — a terminology key
    never shuffles the corpus) and who received a drug exposure within
    ``window_days`` days AFTER the condition was recorded; one row per
    qualifying (person, condition) with the FIRST qualifying exposure.

    Scale shape: the condition↔exposure join is person-keyed (the one
    corpus shuffle); the first-exposure argmin is a partial-aggregated
    min(struct) on the same key, so it reuses the join's partitioning."""
    co = condition_occurrence.select(
        "person_id",
        "condition_concept_code",
        F.to_date("condition_start_date").alias("cond_date"),
    )
    de = drug_exposure.select(
        "person_id",
        "drug_concept_code",
        F.to_date("drug_exposure_start_date").alias("exp_date"),
    )
    qualifying = (
        co.join(F.broadcast(vs_codes), "condition_concept_code")
        .join(de, "person_id")
        .where(
            (col("exp_date") >= col("cond_date"))
            & (F.datediff(col("exp_date"), col("cond_date")) <= window_days)
        )
    )
    first = qualifying.groupBy(
        "person_id", "condition_concept_code", "cond_date"
    ).agg(F.min(F.struct("exp_date", "drug_concept_code")).alias("m"))
    return first.select(
        "person_id",
        "condition_concept_code",
        F.date_format("cond_date", "yyyy-MM-dd").alias(
            "condition_start_date"
        ),
        F.date_format(col("m.exp_date"), "yyyy-MM-dd").alias(
            "first_exposure_date"
        ),
        col("m.drug_concept_code").alias("first_drug_concept_code"),
        F.datediff(col("m.exp_date"), col("cond_date"))
        .cast("int")
        .alias("days_to_treatment"),
    )


def omop_note(docref_df: DataFrame) -> DataFrame:
    """OMOP CDM note projection from DocumentReference — the clinical-
    TEXT bridge between the FHIR surface and the text-pipeline
    operators (lang-ID / quality / dedup run on exactly this column at
    scale): note class from ``type``, date from ``date``, and the body
    DECODED from the base64 ``content.attachment.data`` payload the
    $export carries (extends the reference's person-only OMOP mapping,
    `01_dbignite_sample.py:470-484`). Takes the TYPED DocumentReference
    frame (the ``omop_payer_plan_period`` calling convention).

    Scale shape: one scan, pure projection incl. the JVM-side
    ``unbase64`` — zero shuffles; decode cost is linear in payload
    bytes, the floor for any note ETL."""
    att = F.get(col("content"), 0)["attachment"]
    return docref_df.select(
        col("id").alias("note_id"),
        F.regexp_replace(col("subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        F.substring(col("date"), 1, 10).alias("note_date"),
        _first(col("type.coding.code")).alias("note_class_concept_code"),
        att["title"].alias("note_title"),
        F.unbase64(att["data"]).cast("string").alias("note_text"),
        att["contentType"].alias("encoding_source_value"),
        col("status").alias("status_source_value"),
    )


def omop_visit_detail(enc_df: DataFrame) -> DataFrame:
    """OMOP CDM visit_detail from Encounter.location — the fine-grained
    (ward / bed transfer) companion of ``omop_visit_occurrence``
    (ohdsi.github.io/CommonDataModel/cdm54.html#visit_detail): each
    Encounter.location segment becomes one visit_detail row with its own
    period, ordered by array position, FK'd to its parent visit via
    ``visit_occurrence_id``. Extends the reference's person-only OMOP
    mapping (`01_dbignite_sample.py:470-484`) like the rest of the CDM
    family. Takes the TYPED Encounter frame (the ``omop_specimen``
    calling convention) — the caller reads it with a ``location.period``
    schema override (S4), since the catalog's curated Encounter keeps
    the location struct minimal.

    Scale shape: one scan, posexplode + pure projection — zero
    shuffles; output rows bounded by total location segments."""
    seg = enc_df.select(
        col("id").alias("visit_occurrence_id"),
        F.regexp_replace(col("subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        col("class.code").alias("visit_concept_code"),
        F.posexplode("location").alias("seg", "l"),
    )
    return seg.select(
        F.concat_ws(
            "-", col("visit_occurrence_id"), col("seg").cast("string")
        ).alias("visit_detail_id"),
        "person_id",
        (col("seg") + 1).cast("int").alias("visit_detail_seq"),
        F.regexp_replace(
            col("l.location.reference"), "^Location/", ""
        ).alias("care_site_source_value"),
        col("l.period.start").alias("visit_detail_start_date"),
        col("l.period.end").alias("visit_detail_end_date"),
        col("l.status").alias("status_source_value"),
        "visit_concept_code",
        "visit_occurrence_id",
    )


def omop_episode(
    entry_df: DataFrame,
    persistence_days: int = 30,
    episode_gap_days: int = 40,
) -> DataFrame:
    """OMOP CDM EPISODE over condition eras — the two-level
    gap-and-island the CDM v5.4 oncology/chronic-disease extension
    derives (ohdsi.github.io/CommonDataModel/cdm54.html#episode):
    condition occurrences merge into eras at the 30-day persistence
    window (level 1, the shared ``_era_merge`` core), and eras whose
    inter-era gap (era start minus previous era END) stays within
    ``episode_gap_days`` merge into one disease EPISODE (level 2).
    ``episode_event_count`` carries the linked occurrence total — the
    EPISODE_EVENT companion table's cardinality — and ``era_count`` the
    level-1 island count. Extends the reference's person-only OMOP
    mapping (`01_dbignite_sample.py:470-484`) like the rest of the CDM
    family.

    Scale shape: ONE exchange end-to-end — the level-2 windows
    partition by (person, concept), which the level-1 era groupBy's
    HashPartitioning(person_id, concept, era_seq) does NOT satisfy
    directly, but Spark plans the level-1 chain on
    (person_id, concept) clustering (superset-key groupBy after the
    era windows), so the episode lag/cumsum reuse that partitioning;
    the interval arithmetic is all within-partition."""
    from pyspark.sql.window import Window

    eras = omop_condition_era(entry_df, persistence_days)
    w = Window.partitionBy("person_id", "condition_concept_code").orderBy(
        F.to_date("condition_era_start_date")
    )
    flagged = eras.withColumn(
        "new_ep",
        F.when(
            F.datediff(
                F.to_date("condition_era_start_date"),
                F.lag(F.to_date("condition_era_end_date")).over(w),
            )
            > episode_gap_days,
            1,
        ).otherwise(0),
    )
    eps = flagged.withColumn(
        "episode_number",
        (
            F.sum("new_ep").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            + 1
        ).cast("int"),
    )
    return eps.groupBy(
        "person_id",
        col("condition_concept_code").alias("episode_concept_code"),
        "episode_number",
    ).agg(
        F.min("condition_era_start_date").alias("episode_start_date"),
        F.max("condition_era_end_date").alias("episode_end_date"),
        F.count(F.lit(1)).cast("long").alias("era_count"),
        F.sum("condition_occurrence_count")
        .cast("long")
        .alias("episode_event_count"),
    )


def omop_fact_relationship(spec_df: DataFrame) -> DataFrame:
    """OMOP CDM FACT_RELATIONSHIP from the Specimen parent/aliquot
    chain (ohdsi.github.io/CommonDataModel/cdm54.html#fact_relationship):
    every child specimen's ``parent`` reference lands as TWO rows — the
    CDM stores relationships BIDIRECTIONALLY (child-of and parent-of are
    separate facts), the quirk every OMOP ETL must reproduce. Domains
    are carried as source values ('Specimen' both sides here); extends
    the reference's person-only OMOP mapping
    (`01_dbignite_sample.py:470-484`) like the rest of the CDM family.

    Scale shape: one scan + explode + a UNION of two pure projections —
    zero shuffles; output rows = 2x the parent references."""
    child = spec_df.where(F.size(col("parent")) > 0).select(
        col("id").alias("child_id"),
        F.regexp_replace(col("subject.reference"), "^Patient/", "").alias(
            "person_id"
        ),
        F.explode("parent").alias("p"),
    ).select(
        "child_id",
        "person_id",
        F.regexp_replace(col("p.reference"), "^Specimen/", "").alias(
            "parent_id"
        ),
    )
    fwd = child.select(
        "person_id",
        F.lit("Specimen").alias("domain_concept_1"),
        col("child_id").alias("fact_id_1"),
        F.lit("Specimen").alias("domain_concept_2"),
        col("parent_id").alias("fact_id_2"),
        F.lit("child of").alias("relationship_concept"),
    )
    rev = child.select(
        "person_id",
        F.lit("Specimen").alias("domain_concept_1"),
        col("parent_id").alias("fact_id_1"),
        F.lit("Specimen").alias("domain_concept_2"),
        col("child_id").alias("fact_id_2"),
        F.lit("parent of").alias("relationship_concept"),
    )
    return fwd.unionByName(rev)
