"""Deterministic synthetic FHIR bundle generation.

The reference snapshot ships only 4 ADT sample bundles
(`sampledata/adt_records/`), which exercises the reader but not the
notebook's flattening analytics (`01_dbignite_sample.py:47-56,82-94,
151-160,186-193,471-484` need Condition/Claim/MedicationRequest/
Practitioner resources) and says nothing about reader THROUGHPUT. This
module derives a bundle corpus from the TPC-H ``customer`` table with
pure Column expressions:

- every field of every resource is a deterministic function of
  ``c_custkey`` (and ``c_name``/``c_acctbal``), so a DuckDB oracle can
  reproduce the flattened analytics output relationally — the whole
  JSON-encode → variant-parse → typed-extract → explode/join path gets
  a full value-hash gate;
- the JSON is built JVM-side (``to_json`` over typed structs + concat),
  so generation itself distributes — at 100 TB this same expression
  tree is how you'd mint test corpora on a cluster, not a driver loop.

``write_corpus`` materializes one .json FILE per bundle (deterministic
names) so ``read_from_directory`` — the reader's real file path — can be
benchmarked over thousands of files instead of the reference's 4.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

# One schema version for the on-disk corpus cache; bump when the bundle
# content below changes so stale fixture directories are regenerated.
# v3: + Observation resource per bundle
# v4: + DiagnosticReport, QuestionnaireResponse (round-10 promoted deep
#     schema), NutritionOrder (spine-only type — mixed-corpus retention)
# v5: + Slot (round-10 second promotion batch — scheduling coverage)
# v6: + Flag (round-11 third promotion batch — clinical alerting)
# v7: + Encounter, Procedure (round-11 OMOP widening: visit_occurrence /
#     procedure_occurrence sources — both types were already deep in the
#     curated catalog, the corpus just never carried them)
# v8: + AdverseEvent (round-11 fourth promotion batch — safety reporting)
# v9: + Questionnaire definitions (3 distinct forms, fields closed-form
#     in k % 3 so the per-bundle copies are identical and the canonical
#     definition↔response join has a clean distinct-definitions side)
# v10: Patient gains deceased[x] (every 7th by dateTime, every 7th+3 by
#     boolean — the OMOP death source); NutritionOrder carries its deep
#     fields (round-12 fifth promotion batch proof); Basic takes over
#     the spine-only mixed-corpus retention role NutritionOrder played
#     (its code/subject/created are real R4 fields the DomainResource
#     spine does NOT declare)
# v11: + Invoice (round-12 sixth promotion batch proof — the
#     payer/financial cycle; Money totals + lineItem priceComponent)
# v12: Practitioner gains identifier (NPI), name and qualification —
#     the source fields of the OMOP provider mapping
# v13: + Organization and Location (modular facility dimension — ids
#     org-(k%4) / loc-(k%6), all fields functions of the id index so
#     cross-bundle copies dedupe) — the OMOP care_site/location
#     sources; Location carries position + managingOrganization (added
#     to the curated schema from the R4 spec)
# v14: + InsurancePlan (modular plan catalog, ip-(k%5)) — the round-12
#     seventh promotion batch proof (payer/provider directory:
#     InsurancePlan, OrganizationAffiliation, PaymentReconciliation)
# v15: MedicationRequest becomes a 3-exposure refill HISTORY per
#     patient (mr-/mr2-/mr3-, same RxNorm concept; follow-up gaps
#     10+k%40 and 25+k%20 days straddle the 30-day OMOP persistence
#     window) — the source shape of the drug_era gap-and-island merge
# v16: + Device / DeviceUseStatement / DeviceMetric (the device-domain
#     chain: DUS references its Device within-bundle — the OMOP
#     device_exposure source pair — and DeviceMetric is the EIGHTH
#     promotion batch's proof resource)
CORPUS_VERSION = "v16"
LOINC = "http://loinc.org"

CPT = "http://www.ama-assn.org/go/cpt"
SNOMED = "http://snomed.info/sct"
RXNORM = "http://www.nlm.nih.gov/research/umls/rxnorm"
CLAIM_TYPES = ("institutional", "oral", "pharmacy", "professional")
MED_STATUSES = ("active", "completed", "stopped")


def _cat(*parts) -> F.Column:
    """concat() with automatic string casts for non-literal parts."""
    return F.concat(
        *[F.lit(p) if isinstance(p, str) else p.cast("string") for p in parts]
    )


def _pick(options: tuple[str, ...], idx) -> F.Column:
    """options[k % len] as a Column (1-based element_at)."""
    return F.element_at(
        F.array(*[F.lit(o) for o in options]),
        (idx % len(options) + 1).cast("int"),
    )


def _codeable(code, display, system: str, text=None) -> F.Column:
    """CodeableConcept with one coding; ``text`` fills the free-text field
    the reference notebook projects (`01_dbignite_sample.py:52`) so both
    the coded and the text-fidelity projections are exercisable."""
    fields = [
        F.array(
            F.struct(
                F.lit(system).alias("system"),
                code.alias("code"),
                display.alias("display"),
            )
        ).alias("coding")
    ]
    if text is not None:
        fields.append(text.alias("text"))
    return F.struct(*fields)


def bundle_json_df(
    spark: SparkSession, sf_dir: str, max_custkey: int = 400
) -> DataFrame:
    """(value, _file_path) frame of synthetic bundle JSON documents — one
    bundle per customer with c_custkey < ``max_custkey``, each holding a
    Patient, Condition, Claim (2 items), 3 MedicationRequests (a refill
    history on one RxNorm concept, v15), Practitioner,
    Observation, DiagnosticReport, QuestionnaireResponse, NutritionOrder,
    Slot, Flag, Encounter, Procedure, AdverseEvent, Questionnaire (3
    distinct definitions), a spine-only Basic and an Invoice, all fields
    closed-form functions of c_custkey.
    ``_file_path`` is the stable pseudo-path ``mem://bundles/<key>`` so
    bundleUUIDs are reproducible and oracle-computable (md5 of the same
    string)."""
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    k = col("c_custkey")
    birth = F.format_string(
        "%04d-%02d-%02d", (k % 50 + 1950).cast("int"),
        (k % 12 + 1).cast("int"), (k % 28 + 1).cast("int"),
    )
    patient = F.struct(
        F.lit("Patient").alias("resourceType"),
        _cat("p-", k).alias("id"),
        F.array(
            F.struct(
                F.lit("official").alias("use"),
                col("c_name").alias("text"),
                _cat("F", k % 100).alias("family"),
                F.array(_cat("G", k % 100)).alias("given"),
            )
        ).alias("name"),
        F.when(k % 2 == 0, F.lit("male")).otherwise(F.lit("female")).alias("gender"),
        birth.alias("birthDate"),
        # deceased[x] choice: every 7th patient by dateTime, every
        # 7th+3 by bare boolean (death known, date unknown) — to_json's
        # ignoreNullFields drops the absent branch, so emitted JSON
        # carries at most one, like real FHIR
        F.when(k % 7 == 3, F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
        .alias("deceasedBoolean"),
        F.when(
            k % 7 == 0,
            F.format_string(
                "%04d-%02d-%02d", (k % 30 + 1990).cast("int"),
                ((k + 2) % 12 + 1).cast("int"), ((k + 10) % 28 + 1).cast("int"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
        .alias("deceasedDateTime"),
        F.array(
            F.struct(
                F.lit("home").alias("use"),
                _cat("city-", k % 25).alias("city"),
                _cat("S", k % 50).alias("state"),
                F.format_string("%05d", (k % 99999).cast("int")).alias("postalCode"),
                F.lit("US").alias("country"),
            )
        ).alias("address"),
    )
    condition = F.struct(
        F.lit("Condition").alias("resourceType"),
        _cat("cond-", k).alias("id"),
        F.struct(
            F.array(
                F.struct(
                    F.when(k % 3 == 0, F.lit("resolved"))
                    .otherwise(F.lit("active"))
                    .alias("code")
                )
            ).alias("coding")
        ).alias("clinicalStatus"),
        _codeable(
            _cat("C", k % 50), _cat("cond-", k % 50), SNOMED,
            text=_cat("condtext-", k % 50),
        ).alias("code"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 8 + 2015).cast("int"),
            ((k + 3) % 12 + 1).cast("int"), ((k + 5) % 28 + 1).cast("int"),
        ).alias("recordedDate"),
    )
    item = lambda off: F.struct(  # noqa: E731 - local shape helper
        F.lit(off + 1).alias("sequence"),
        _codeable(
            _cat("PR", (k + off) % 40), _cat("proc-", (k + off) % 40), CPT
        ).alias("productOrService"),
    )
    claim = F.struct(
        F.lit("Claim").alias("resourceType"),
        _cat("cl-", k).alias("id"),
        F.lit("active").alias("status"),
        _codeable(_pick(CLAIM_TYPES, k), _pick(CLAIM_TYPES, k), "claim-type").alias(
            "type"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("patient"),
        F.array(
            F.struct(
                F.lit(1).alias("sequence"),
                F.lit(True).alias("focal"),
                F.struct(_cat("Coverage/cov-", k % 7).alias("reference")).alias(
                    "coverage"
                ),
            )
        ).alias("insurance"),
        F.array(item(0), item(1)).alias("item"),
        F.struct(
            col("c_acctbal").alias("value"), F.lit("USD").alias("currency")
        ).alias("total"),
    )
    med_base = F.format_string(
        "%04d-%02d-%02d", (k % 6 + 2018).cast("int"),
        ((k + 1) % 12 + 1).cast("int"), ((k + 7) % 28 + 1).cast("int"),
    )

    def _medreq(id_prefix: str, status_idx, authored: F.Column) -> F.Column:
        return F.struct(
            F.lit("MedicationRequest").alias("resourceType"),
            _cat(id_prefix, k).alias("id"),
            _pick(MED_STATUSES, status_idx).alias("status"),
            F.lit("order").alias("intent"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit(RXNORM).alias("system"),
                        _cat("RX", k % 30).alias("code"),
                    )
                ).alias("coding"),
                _cat("med-", k % 30).alias("text"),
            ).alias("medicationCodeableConcept"),
            F.struct(_cat("Patient/p-", k).alias("reference")).alias(
                "subject"
            ),
            authored.alias("authoredOn"),
        )

    # v15: a refill history — same RxNorm concept, follow-up gaps that
    # straddle the 30-day OMOP drug_era persistence window (gap1 in
    # [10, 49], gap2 in [25, 44]) so era merging is data-dependent
    medreq = _medreq("mr-", k, med_base)
    medreq2 = _medreq(
        "mr2-", k + 1,
        F.date_format(
            F.date_add(F.to_date(med_base), (k % 40 + 10).cast("int")),
            "yyyy-MM-dd",
        ),
    )
    medreq3 = _medreq(
        "mr3-", k + 2,
        F.date_format(
            F.date_add(
                F.to_date(med_base),
                (k % 40 + 10 + k % 20 + 25).cast("int"),
            ),
            "yyyy-MM-dd",
        ),
    )
    practitioner = F.struct(
        F.lit("Practitioner").alias("resourceType"),
        _cat("dr-", k).alias("id"),
        # NPI identifier + name + qualification: the source fields of
        # the OMOP provider mapping (corpus v12)
        F.array(
            F.struct(
                F.lit("http://hl7.org/fhir/sid/us-npi").alias("system"),
                F.format_string("1%09d", (k % 1000000).cast("int")).alias(
                    "value"
                ),
            )
        ).alias("identifier"),
        (k % 2 == 0).alias("active"),
        F.array(
            F.struct(
                _cat("Dr. D", k % 100).alias("text"),
                _cat("D", k % 100).alias("family"),
                F.array(_cat("E", k % 100)).alias("given"),
            )
        ).alias("name"),
        F.when(k % 2 == 0, F.lit("female")).otherwise(F.lit("male")).alias("gender"),
        F.array(
            F.struct(
                F.lit("phone").alias("system"),
                F.format_string("555-%04d", (k % 10000).cast("int")).alias("value"),
                F.lit("work").alias("use"),
            )
        ).alias("telecom"),
        F.array(
            F.struct(
                _codeable(
                    _pick(("MD", "DO", "NP"), k),
                    _pick(("Doctor of Medicine", "Doctor of Osteopathy",
                           "Nurse Practitioner"), k),
                    "http://terminology.hl7.org/CodeSystem/v2-0360",
                ).alias("code")
            )
        ).alias("qualification"),
    )

    observation = F.struct(
        F.lit("Observation").alias("resourceType"),
        _cat("obs-", k).alias("id"),
        _pick(("final", "amended", "preliminary"), k).alias("status"),
        _codeable(_cat("L", k % 20), _cat("loinc-", k % 20), LOINC).alias(
            "code"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 5 + 2019).cast("int"),
            ((k + 2) % 12 + 1).cast("int"), ((k + 9) % 28 + 1).cast("int"),
        ).alias("effectiveDateTime"),
        F.struct(
            # integer part + m/10.0: exactly the double DuckDB computes
            # from the same expression, and JSON shortest-repr round-trips
            (k % 60 + 140 + (k % 10) / F.lit(10.0)).alias("value"),
            F.lit("cm").alias("unit"),
            F.lit("http://unitsofmeasure.org").alias("system"),
            F.lit("cm").alias("code"),
        ).alias("valueQuantity"),
    )

    diagreport = F.struct(
        F.lit("DiagnosticReport").alias("resourceType"),
        _cat("dx-", k).alias("id"),
        _pick(("final", "amended", "corrected"), k).alias("status"),
        _codeable(_cat("LAB", k % 15), _cat("panel-", k % 15), LOINC).alias(
            "code"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 4 + 2020).cast("int"),
            ((k + 4) % 12 + 1).cast("int"), ((k + 11) % 28 + 1).cast("int"),
        ).alias("effectiveDateTime"),
        _cat("conclusion-", k % 10).alias("conclusion"),
        F.array(
            F.struct(_cat("Observation/obs-", k).alias("reference"))
        ).alias("result"),
    )

    # QuestionnaireResponse exercises the round-10 promoted deep schema:
    # repeated item[] with answer[] value[x] leaves. Both items share one
    # struct shape (F.array needs homogeneous elements); to_json's
    # default ignoreNullFields drops the absent choice field per item, so
    # the emitted JSON is idiomatic value[x].
    qr_item = lambda link, vi, vs: F.struct(  # noqa: E731 - shape helper
        F.lit(link).alias("linkId"),
        _cat("question-", link).alias("text"),
        F.array(
            F.struct(
                vi.alias("valueInteger"),
                vs.alias("valueString"),
            )
        ).alias("answer"),
    )
    qresp = F.struct(
        F.lit("QuestionnaireResponse").alias("resourceType"),
        _cat("qr-", k).alias("id"),
        _pick(("completed", "in-progress", "amended"), k).alias("status"),
        _cat("Questionnaire/phq-", k % 3).alias("questionnaire"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 3 + 2021).cast("int"),
            ((k + 6) % 12 + 1).cast("int"), ((k + 13) % 28 + 1).cast("int"),
        ).alias("authored"),
        F.array(
            qr_item(
                "score", (k % 27).cast("int"), F.lit(None).cast("string")
            ),
            qr_item(
                "note", F.lit(None).cast("int"), _cat("note-", k % 7)
            ),
        ).alias("item"),
    )

    # NutritionOrder carries its deep fields since the round-12 fifth
    # promotion batch (diet codes, patient attribution, order date) —
    # the spine-only retention role it used to play moved to Basic
    # below.
    nutrition = F.struct(
        F.lit("NutritionOrder").alias("resourceType"),
        _cat("nut-", k).alias("id"),
        _pick(("en", "es", "fr"), k).alias("language"),
        _pick(("active", "on-hold", "completed"), k).alias("status"),
        F.lit("order").alias("intent"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("patient"),
        F.format_string(
            "%04d-%02d-%02d", (k % 3 + 2022).cast("int"),
            ((k + 7) % 12 + 1).cast("int"), ((k + 15) % 28 + 1).cast("int"),
        ).alias("dateTime"),
        F.struct(
            F.array(
                _codeable(
                    _cat("DIET", k % 6), _cat("diet-", k % 6), SNOMED
                )
            ).alias("type"),
            _cat("instruction-", k % 9).alias("instruction"),
        ).alias("oralDiet"),
    )

    # Basic is the spine-only mixed-corpus retention exerciser:
    # code/subject/created are real R4 fields the DomainResource spine
    # does NOT declare — full=True must retain the row (id/language
    # extracted) while ignoring the undeclared fields. Basic is FHIR's
    # designated "no appropriate resource type" escape hatch, so it is
    # the one type that should NEVER be promoted to a deep schema.
    basic = F.struct(
        F.lit("Basic").alias("resourceType"),
        _cat("bas-", k).alias("id"),
        _pick(("en", "es", "fr"), k).alias("language"),
        _codeable(_cat("BAS", k % 4), _cat("basic-", k % 4), SNOMED).alias(
            "code"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
    )

    # Slot exercises the round-10 second promotion batch (scheduling):
    # schedule reference, ISO start/end, appointmentType coding
    slot = F.struct(
        F.lit("Slot").alias("resourceType"),
        _cat("slot-", k).alias("id"),
        _pick(("busy", "free", "busy-tentative"), k).alias("status"),
        F.struct(_cat("Schedule/sch-", k % 5).alias("reference")).alias(
            "schedule"
        ),
        _codeable(
            _pick(("ROUTINE", "WALKIN", "CHECKUP"), k + 1),
            _cat("appt-", (k + 1) % 3),
            "http://terminology.hl7.org/CodeSystem/v2-0276",
        ).alias("appointmentType"),
        F.format_string(
            "%04d-%02d-%02dT%02d:00:00Z", (k % 2 + 2024).cast("int"),
            ((k + 8) % 12 + 1).cast("int"), ((k + 17) % 28 + 1).cast("int"),
            (k % 10 + 8).cast("int"),
        ).alias("start"),
        F.format_string(
            "%04d-%02d-%02dT%02d:30:00Z", (k % 2 + 2024).cast("int"),
            ((k + 8) % 12 + 1).cast("int"), ((k + 17) % 28 + 1).cast("int"),
            (k % 10 + 8).cast("int"),
        ).alias("end"),
    )

    # Flag exercises the round-11 third promotion batch (clinical
    # alerting): R4 flag-category coding, active period, patient subject
    flag = F.struct(
        F.lit("Flag").alias("resourceType"),
        _cat("flag-", k).alias("id"),
        _pick(("active", "inactive", "entered-in-error"), k + 2).alias(
            "status"
        ),
        F.array(
            _codeable(
                _pick(("safety", "clinical", "drug"), k),
                _pick(("safety", "clinical", "drug"), k),
                "http://terminology.hl7.org/CodeSystem/flag-category",
            )
        ).alias("category"),
        _codeable(
            _cat("FL", k % 10), _cat("flagcode-", k % 10), SNOMED
        ).alias("code"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.struct(
            F.format_string(
                "%04d-%02d-%02d", (k % 3 + 2022).cast("int"),
                ((k + 10) % 12 + 1).cast("int"), ((k + 19) % 28 + 1).cast("int"),
            ).alias("start")
        ).alias("period"),
    )

    # Encounter exercises the R4 class Coding (a bare Coding, NOT a
    # CodeableConcept — the classic R4 modeling trap) and Period bounds;
    # source for the OMOP visit_occurrence mapping
    encounter = F.struct(
        F.lit("Encounter").alias("resourceType"),
        _cat("enc-", k).alias("id"),
        _pick(("finished", "in-progress", "cancelled"), k).alias("status"),
        F.struct(
            F.lit(
                "http://terminology.hl7.org/CodeSystem/v3-ActCode"
            ).alias("system"),
            _pick(("AMB", "IMP", "EMER"), k + 1).alias("code"),
            _pick(("ambulatory", "inpatient", "emergency"), k + 1).alias(
                "display"
            ),
        ).alias("class"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.struct(
            F.format_string(
                "%04d-%02d-%02d", (k % 6 + 2017).cast("int"),
                ((k + 4) % 12 + 1).cast("int"), ((k + 6) % 28 + 1).cast("int"),
            ).alias("start"),
            F.format_string(
                "%04d-%02d-%02d", (k % 6 + 2017).cast("int"),
                ((k + 4) % 12 + 1).cast("int"),
                ((k + 11) % 28 + 1).cast("int"),
            ).alias("end"),
        ).alias("period"),
    )

    # Procedure: CPT-coded with free text — source for the OMOP
    # procedure_occurrence mapping
    procedure = F.struct(
        F.lit("Procedure").alias("resourceType"),
        _cat("prc-", k).alias("id"),
        _pick(("completed", "in-progress", "stopped"), k + 1).alias(
            "status"
        ),
        _codeable(
            _cat("PC", k % 35), _cat("procname-", k % 35), CPT,
            text=_cat("proctext-", k % 35),
        ).alias("code"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 7 + 2016).cast("int"),
            ((k + 5) % 12 + 1).cast("int"), ((k + 8) % 28 + 1).cast("int"),
        ).alias("performedDateTime"),
    )

    # Questionnaire DEFINITION (batch-4 promoted type): every field is a
    # function of k % 3 only, so the corpus carries exactly 3 distinct
    # definitions (one per PHQ form) replicated per bundle — the
    # canonical-reference join target for QuestionnaireResponse. The
    # url deliberately equals the response's `questionnaire` value.
    j = k % 3
    qdef = F.struct(
        F.lit("Questionnaire").alias("resourceType"),
        _cat("qdef-", j).alias("id"),
        _cat("Questionnaire/phq-", j).alias("url"),
        _cat("v", j).alias("version"),
        _cat("phq-", j).alias("name"),
        _cat("PHQ form ", j).alias("title"),
        _pick(("active", "draft", "retired"), j).alias("status"),
        F.array(
            F.struct(
                F.lit("score").alias("linkId"),
                _cat("How often? (form ", j, ")").alias("text"),
                F.lit("integer").alias("type"),
                F.lit(True).alias("required"),
            )
        ).alias("item"),
    )

    # AdverseEvent exercises the round-11 fourth promotion batch
    # (safety reporting): actuality code, seriousness/severity
    # CodeableConcepts, patient subject, 0..1 identifier
    adverse = F.struct(
        F.lit("AdverseEvent").alias("resourceType"),
        _cat("ae-", k).alias("id"),
        F.when(k % 4 == 0, F.lit("potential"))
        .otherwise(F.lit("actual"))
        .alias("actuality"),
        _codeable(
            _cat("AE", k % 12), _cat("event-", k % 12), SNOMED
        ).alias("event"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 4 + 2021).cast("int"),
            ((k + 12) % 12 + 1).cast("int"), ((k + 21) % 28 + 1).cast("int"),
        ).alias("date"),
        _codeable(
            _pick(("serious", "non-serious"), k),
            _pick(("serious", "non-serious"), k),
            "http://terminology.hl7.org/CodeSystem/adverse-event-seriousness",
        ).alias("seriousness"),
        _codeable(
            _pick(("mild", "moderate", "severe"), k + 1),
            _pick(("mild", "moderate", "severe"), k + 1),
            "http://terminology.hl7.org/CodeSystem/adverse-event-severity",
        ).alias("severity"),
    )

    # Invoice exercises the round-12 sixth promotion batch (payer/
    # financial cycle): Money totals and a lineItem priceComponent —
    # quarter-dollar values so the doubles are float-exact on both the
    # Spark and DuckDB sides.
    gross = (k % 900) + 100 + (k % 4) / F.lit(4.0)
    money = F.struct(gross.alias("value"), F.lit("USD").alias("currency"))
    invoice = F.struct(
        F.lit("Invoice").alias("resourceType"),
        _cat("inv-", k).alias("id"),
        _pick(("issued", "balanced", "draft"), k).alias("status"),
        _codeable(
            _pick(("patient", "insurance"), k),
            _pick(("patient", "insurance"), k),
            "http://terminology.hl7.org/CodeSystem/invoice-type",
        ).alias("type"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 4 + 2021).cast("int"),
            ((k + 10) % 12 + 1).cast("int"), ((k + 19) % 28 + 1).cast("int"),
        ).alias("date"),
        F.array(
            F.struct(
                F.lit(1).alias("sequence"),
                _codeable(
                    _cat("CHG", k % 8), _cat("charge-", k % 8), CPT
                ).alias("chargeItemCodeableConcept"),
                F.array(
                    F.struct(
                        F.lit("base").alias("type"), money.alias("amount")
                    )
                ).alias("priceComponent"),
            )
        ).alias("lineItem"),
        money.alias("totalNet"),
        money.alias("totalGross"),
    )

    # v13: Organization + Location — the OMOP health-system domain's
    # care_site/location sources. Ids are MODULAR (org-(k%4), loc-(k%6))
    # and every field is a function of the id index alone, so the same
    # facility re-shipped by many bundles is byte-identical and the
    # mapper's distinct collapses it; Location.managingOrganization is
    # keyed off the LOCATION index (org-((k%6)%4)) so a given ward
    # always names the same hospital.
    org_i = k % 4
    loc_i = k % 6
    organization = F.struct(
        F.lit("Organization").alias("resourceType"),
        _cat("org-", org_i).alias("id"),
        F.lit(True).alias("active"),
        F.array(
            _codeable(
                F.lit("prov"),
                F.lit("Healthcare Provider"),
                "http://terminology.hl7.org/CodeSystem/organization-type",
            )
        ).alias("type"),
        _cat("Hospital ", org_i).alias("name"),
        F.array(
            F.struct(
                F.array(_cat(org_i * 100 + 100, " Main St")).alias("line"),
                _cat("City", org_i).alias("city"),
                _pick(("CA", "NY", "TX", "WA"), org_i).alias("state"),
                F.format_string(
                    "9%04d", (org_i * 13 + 11).cast("int")
                ).alias("postalCode"),
            )
        ).alias("address"),
    )
    location = F.struct(
        F.lit("Location").alias("resourceType"),
        _cat("loc-", loc_i).alias("id"),
        F.lit("active").alias("status"),
        _cat("Ward ", loc_i).alias("name"),
        F.lit("instance").alias("mode"),
        F.array(
            _codeable(
                _pick(("HOSP", "ER", "ICU"), loc_i),
                _pick(("HOSP", "ER", "ICU"), loc_i),
                "http://terminology.hl7.org/CodeSystem/v3-RoleCode",
            )
        ).alias("type"),
        F.struct(
            F.array(_cat(loc_i + 1, " Care Way")).alias("line"),
            _cat("LCity", loc_i).alias("city"),
            _pick(("CA", "NY", "TX", "WA", "OR", "AZ"), loc_i).alias(
                "state"
            ),
            F.format_string(
                "8%04d", (loc_i * 31 + 7).cast("int")
            ).alias("postalCode"),
        ).alias("address"),
        # exact quarter/half-degree coordinates: float-identical in any
        # engine (the OMOP location lat/lon source)
        F.struct(
            (F.lit(-120.0) + loc_i / F.lit(4.0)).alias("longitude"),
            (F.lit(30.0) + loc_i / F.lit(2.0)).alias("latitude"),
        ).alias("position"),
        F.struct(
            _cat("Organization/org-", loc_i % 4).alias("reference")
        ).alias("managingOrganization"),
    )

    # v14: InsurancePlan — the round-12 SEVENTH promotion batch proof
    # (payer/provider directory). A modular plan-catalog dimension
    # (ip-(k%5), fields functions of the index alone) whose nested
    # coverage.benefit.limit and plan.generalCost arrays exercise the
    # promoted schema three levels deep; money/limit values are
    # quarter-exact doubles.
    # v16 device-domain chain: Device + its use statement (references
    # the device within-bundle, the OMOP device_exposure source pair)
    # + a telemetry DeviceMetric (eighth promotion batch proof)
    device = F.struct(
        F.lit("Device").alias("resourceType"),
        _cat("dev-", k).alias("id"),
        F.array(
            F.struct(
                _cat("UDI-", k % 18).alias("deviceIdentifier"),
                F.lit("FDA").alias("issuer"),
            )
        ).alias("udiCarrier"),
        _pick(("active", "inactive"), k).alias("status"),
        _cat("mfg-", k % 6).alias("manufacturer"),
        _cat("SN", k).alias("serialNumber"),
        F.array(
            F.struct(
                _cat("devname-", k % 15).alias("name"),
                F.lit("user-friendly-name").alias("type"),
            )
        ).alias("deviceName"),
        _codeable(_cat("DV", k % 15), _cat("devtype-", k % 15), SNOMED).alias(
            "type"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("patient"),
    )
    dus_start = F.format_string(
        "%04d-%02d-%02d", (k % 4 + 2021).cast("int"),
        ((k + 3) % 12 + 1).cast("int"), ((k + 14) % 28 + 1).cast("int"),
    )
    devuse = F.struct(
        F.lit("DeviceUseStatement").alias("resourceType"),
        _cat("dus-", k).alias("id"),
        _pick(("active", "completed", "intended"), k + 1).alias("status"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.struct(
            dus_start.alias("start"),
            F.date_format(
                F.date_add(F.to_date(dus_start), (k % 90 + 30).cast("int")),
                "yyyy-MM-dd",
            ).alias("end"),
        ).alias("timingPeriod"),
        dus_start.alias("recordedOn"),
        F.struct(_cat("Device/dev-", k).alias("reference")).alias("device"),
        _codeable(_cat("BS", k % 8), _cat("site-", k % 8), SNOMED).alias(
            "bodySite"
        ),
    )
    devmetric = F.struct(
        F.lit("DeviceMetric").alias("resourceType"),
        _cat("dm-", k).alias("id"),
        _codeable(
            _cat("MDC", k % 12), _cat("metric-", k % 12),
            "urn:iso:std:iso:11073:10101",
        ).alias("type"),
        _codeable(
            _pick(("mmHg", "bpm", "pct"), k),
            _pick(("mmHg", "bpm", "pct"), k),
            "http://unitsofmeasure.org",
        ).alias("unit"),
        F.struct(_cat("Device/dev-", k).alias("reference")).alias("parent"),
        _pick(("on", "off", "standby"), k + 1).alias("operationalStatus"),
        _pick(("measurement", "setting", "calculation"), k).alias("category"),
    )
    ip_i = k % 5
    iplan = F.struct(
        F.lit("InsurancePlan").alias("resourceType"),
        _cat("ip-", ip_i).alias("id"),
        _pick(("active", "retired"), ip_i).alias("status"),
        F.array(
            _codeable(
                F.lit("medical"),
                F.lit("Medical"),
                "http://terminology.hl7.org/CodeSystem/insurance-plan-type",
            )
        ).alias("type"),
        _cat("Plan ", ip_i).alias("name"),
        F.struct(
            _cat("Organization/org-", ip_i % 4).alias("reference")
        ).alias("ownedBy"),
        F.struct(
            _cat("Organization/org-", (ip_i + 1) % 4).alias("reference")
        ).alias("administeredBy"),
        F.array(
            F.struct(
                _codeable(F.lit("medical"), F.lit("Medical"), SNOMED).alias(
                    "type"
                ),
                F.array(
                    F.struct(
                        _codeable(
                            _pick(
                                ("primary-care", "emergency", "specialty"),
                                ip_i,
                            ),
                            _pick(
                                ("primary-care", "emergency", "specialty"),
                                ip_i,
                            ),
                            SNOMED,
                        ).alias("type"),
                        F.array(
                            F.struct(
                                F.struct(
                                    (
                                        F.lit(10.0) + ip_i * F.lit(10.0)
                                    ).alias("value"),
                                    F.lit("visits").alias("unit"),
                                ).alias("value"),
                                _codeable(
                                    F.lit("visits-per-year"),
                                    F.lit("Visits per year"),
                                    SNOMED,
                                ).alias("code"),
                            )
                        ).alias("limit"),
                    )
                ).alias("benefit"),
            )
        ).alias("coverage"),
        F.array(
            F.struct(
                _codeable(
                    _pick(("bronze", "silver", "gold"), ip_i),
                    _pick(("bronze", "silver", "gold"), ip_i),
                    "http://terminology.hl7.org/CodeSystem/insurance-plan-type",
                ).alias("type"),
                F.array(
                    F.struct(
                        _codeable(
                            F.lit("premium"), F.lit("Premium"), SNOMED
                        ).alias("type"),
                        (ip_i + 1).cast("int").alias("groupSize"),
                        F.struct(
                            (
                                F.lit(100.0)
                                + ip_i * F.lit(25.0)
                                + ip_i / F.lit(4.0)
                            ).alias("value"),
                            F.lit("USD").alias("currency"),
                        ).alias("cost"),
                    )
                ).alias("generalCost"),
            )
        ).alias("plan"),
    )

    def entry_json(resource: F.Column) -> F.Column:
        return F.to_json(F.struct(resource.alias("resource")))

    bundle = F.concat(
        F.lit('{"resourceType":"Bundle","id":"'),
        _cat("b-", k),
        F.lit('","type":"transaction","timestamp":"2024-01-01T00:00:00Z","entry":['),
        F.concat_ws(
            ",",
            entry_json(patient),
            entry_json(condition),
            entry_json(claim),
            entry_json(medreq),
            entry_json(medreq2),
            entry_json(medreq3),
            entry_json(practitioner),
            entry_json(observation),
            entry_json(diagreport),
            entry_json(qresp),
            entry_json(nutrition),
            entry_json(slot),
            entry_json(flag),
            entry_json(encounter),
            entry_json(procedure),
            entry_json(adverse),
            entry_json(qdef),
            entry_json(basic),
            entry_json(invoice),
            entry_json(organization),
            entry_json(location),
            entry_json(iplan),
            entry_json(device),
            entry_json(devuse),
            entry_json(devmetric),
        ),
        F.lit("]}"),
    )
    return c.where(k < max_custkey).select(
        bundle.alias("value"), _cat("mem://bundles/", k).alias("_file_path")
    )


def corpus_dir(sf_dir: str, max_custkey: int) -> str:
    """Stable on-disk location for the generated file corpus; keyed by sf
    and generator version so distinct scales/content never collide."""
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        "/tmp/interop_spark_fixtures",
        f"bundles-{sf_name}-k{max_custkey}-{CORPUS_VERSION}",
    )


def write_corpus(
    spark: SparkSession, sf_dir: str, max_custkey: int = 1200
) -> str:
    """Materialize the synthetic corpus as one .json file per bundle with
    DETERMINISTIC names (bundle-<key>.json) and return the directory.
    Idempotent: a completed corpus (marker file) is reused.

    The collect is bounded fixture tooling (≤ a few thousand small JSON
    strings), not a pipeline operator — the distributed write path for a
    real corpus is ``bundle_json_df(...).write`` to an object store.
    """
    out = corpus_dir(sf_dir, max_custkey)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    rows = bundle_json_df(spark, sf_dir, max_custkey=max_custkey).collect()
    # Stage into a PER-PROCESS dir: a shared `out + ".tmp"` would let two
    # concurrent generators interleave writes (and the loser's cleanup
    # delete a third writer's files). The atomic os.rename is the only
    # commit point; losing the rename race (or finding `out` already
    # present) just means another writer won — discard our staging copy.
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp)
    for r in rows:
        key = r["_file_path"].rsplit("/", 1)[-1]
        with open(os.path.join(tmp, f"bundle-{int(key):06d}.json"), "w") as f:
            f.write(r["value"])
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write(f"{len(rows)}\n")
    try:
        os.rename(tmp, out)
    except OSError:  # lost the race: a complete corpus already landed
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# NDJSON bulk-export fixture (round-10): the $export layout — one file per
# resource type, one resource JSON per line — for the FhirNdjson reader.
# --------------------------------------------------------------------------

# v2: + Condition (the type the patient-conditions flatten consumes, so
#     the NDJSON→bundle-row bridge can be oracled against the same
#     closed-form derivations as the bundle corpus)
# v3: + Coverage / Account / AllergyIntolerance — the three patient-
#     attribution shapes beyond subject/patient structs (r11 verdict
#     item 2): Coverage keys on ``beneficiary``, Account on a 0..*
#     ``subject`` ARRAY (every 10th account names TWO patients, so the
#     multi-patient compartment fan-out is exercised, not just typed),
#     AllergyIntolerance on the ``patient`` struct.
# v4: + OperationOutcome — what a bulk ``$export``'s ERROR files carry
#     (the spec's manifest lists OperationOutcome NDJSON files under
#     ``error``); every 4th outcome has TWO issues so the issue-array
#     explode is exercised, not just typed.
# v5: Coverage gains ``period`` (start always; end only when cancelled —
#     to_json drops the null) so the OMOP payer_plan_period mapping has
#     its source interval.
# v6: (a) Condition becomes a 3-recording FOLLOW-UP HISTORY per patient
#     (same SNOMED code; the two follow-up gaps straddle the 30-day OMOP
#     persistence window exactly like the bundle corpus's med refills)
#     so condition_era's gap-and-island merge is data-dependent;
#     (b) + the terminology trio (CodeSystem / ValueSet / ConceptMap —
#     the round-13 NINTH promotion batch): bounded DEFINITIONAL files
#     the way a real terminology feed ships them — one CodeSystem
#     carrying the 50 synthetic condition concepts, one ValueSet
#     selecting the reportable subset, one ConceptMap collapsing the 50
#     source codes onto 10 standard target concepts (what a FHIR→OMOP
#     ETL loads to translate source codes to standard concept ids).
# v7: + MedicationRequest — the 3-refill history (SAME closed-form
#     dates as the bundle corpus's v15 refill history, so the oracle
#     macros are shared) with dosageInstruction doseQuantity; every
#     third patient's final refill DOUBLES the dose, so the OMOP
#     dose_era mapping must split that era on the dose dimension even
#     though the gap is inside the persistence window.
# v8: Observation rows gain the R4 `category` (laboratory) and every
#     patient adds a smoking-status SOCIAL-HISTORY Observation
#     (valueCodeableConcept, no valueQuantity) — the category split the
#     OMOP measurement-vs-observation domain decision runs on; +
#     Specimen (type coding, collection.collectedDateTime, quantity) for
#     the CDM specimen table; + Device / DeviceUseStatement — a 3-wear
#     history per patient (same gap closed forms as the condition
#     follow-ups, straddling the 30-day persistence window) so
#     device_era's merge is data-dependent.
# v9: + Measure / Library / PlanDefinition definitional files (tenth
#     promotion batch — the quality-measure/eCQM trio): 5 measures
#     naming their logic Library by canonical url, 5 libraries with CQL
#     attachment stubs, 5 plan definitions with applicability-condition
#     actions.
# v10: + ResearchStudy (5 trial definitions with phase/arms, eleventh
#     promotion batch) / ResearchSubject (one enrollment per patient —
#     the Patient↔study linkage with arm + status closed-form) +
#     DocumentReference — one progress note per patient whose
#     content.attachment.data is the BASE64 of a closed-form note text
#     (the OMOP note source; the oracle recomputes the plaintext).
NDJSON_VERSION = "v10"


def ndjson_resource_dfs(
    spark: SparkSession, sf_dir: str, max_custkey: int = 400
) -> dict[str, DataFrame]:
    """Per-type single-column (``value``) frames of resource JSON lines,
    fields closed-form in c_custkey (the SAME derivations as the bundle
    corpus's Patient/Observation, so the relational oracles are shared
    idioms). JSON is built JVM-side via ``to_json`` — generation
    distributes like the bundle path."""
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    k = col("c_custkey")
    patient = F.struct(
        F.lit("Patient").alias("resourceType"),
        _cat("p-", k).alias("id"),
        F.when(k % 2 == 0, F.lit("male")).otherwise(F.lit("female")).alias(
            "gender"
        ),
        F.format_string(
            "%04d-%02d-%02d", (k % 50 + 1950).cast("int"),
            (k % 12 + 1).cast("int"), (k % 28 + 1).cast("int"),
        ).alias("birthDate"),
    )
    # v8: the lab rows carry the R4 category the OMOP domain split keys
    # on; the social-history twin has valueCodeableConcept instead of
    # valueQuantity (smoking status, the canonical OMOP observation row)
    _OBS_CAT = "http://terminology.hl7.org/CodeSystem/observation-category"
    observation = F.struct(
        F.lit("Observation").alias("resourceType"),
        _cat("obs-", k).alias("id"),
        _pick(("final", "amended", "preliminary"), k).alias("status"),
        F.array(
            _codeable(F.lit("laboratory"), F.lit("Laboratory"), _OBS_CAT)
        ).alias("category"),
        _codeable(_cat("L", k % 20), _cat("loinc-", k % 20), LOINC).alias(
            "code"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.struct(
            (k % 60 + 140 + (k % 10) / F.lit(10.0)).alias("value"),
            F.lit("cm").alias("unit"),
        ).alias("valueQuantity"),
    )
    smoking_codes = ("266919005", "8517006", "77176002")
    smoking_texts = ("Never smoker", "Former smoker", "Current smoker")
    obs_social = F.struct(
        F.lit("Observation").alias("resourceType"),
        _cat("obs-sh-", k).alias("id"),
        F.lit("final").alias("status"),
        F.array(
            _codeable(
                F.lit("social-history"), F.lit("Social History"), _OBS_CAT
            )
        ).alias("category"),
        _codeable(
            F.lit("72166-2"), F.lit("Tobacco smoking status"), LOINC
        ).alias("code"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 6 + 2017).cast("int"),
            ((k + 8) % 12 + 1).cast("int"), ((k + 3) % 28 + 1).cast("int"),
        ).alias("effectiveDateTime"),
        _codeable(
            _pick(smoking_codes, k), _pick(smoking_texts, k), SNOMED
        ).alias("valueCodeableConcept"),
    )
    # v6: a 3-recording follow-up history per patient (same code, so the
    # per-(person, concept) era merge is exercised; the first follow-up
    # gap k%40+10 and the second k%20+25 straddle the 30-day window).
    cond_d0 = F.format_string(
        "%04d-%02d-%02d", (k % 8 + 2015).cast("int"),
        ((k + 3) % 12 + 1).cast("int"), ((k + 5) % 28 + 1).cast("int"),
    )
    cond_d1 = F.date_format(
        F.date_add(F.to_date(cond_d0), (k % 40 + 10).cast("int")),
        "yyyy-MM-dd",
    )
    cond_d2 = F.date_format(
        F.date_add(F.to_date(cond_d1), (k % 20 + 25).cast("int")),
        "yyyy-MM-dd",
    )

    def _condition(cid: F.Column, recorded: F.Column) -> F.Column:
        return F.struct(
            F.lit("Condition").alias("resourceType"),
            cid.alias("id"),
            F.struct(
                F.array(
                    F.struct(
                        F.when(k % 3 == 0, F.lit("resolved"))
                        .otherwise(F.lit("active"))
                        .alias("code")
                    )
                ).alias("coding")
            ).alias("clinicalStatus"),
            _codeable(
                _cat("C", k % 50), _cat("cond-", k % 50), SNOMED,
                text=_cat("condtext-", k % 50),
            ).alias("code"),
            F.struct(_cat("Patient/p-", k).alias("reference")).alias(
                "subject"
            ),
            recorded.alias("recordedDate"),
        )

    conditions = F.array(
        _condition(_cat("cond-", k), cond_d0),
        _condition(F.concat(_cat("cond-", k), F.lit("-f1")), cond_d1),
        _condition(F.concat(_cat("cond-", k), F.lit("-f2")), cond_d2),
    )
    # Coverage attributes through `beneficiary` (the R4 patient
    # compartment's Coverage path — neither subject nor patient exists
    # on the type).
    coverage = F.struct(
        F.lit("Coverage").alias("resourceType"),
        _cat("cov-", k).alias("id"),
        F.when(k % 5 == 0, F.lit("cancelled"))
        .otherwise(F.lit("active"))
        .alias("status"),
        _codeable(
            _pick(("EHCPOL", "PUBLICPOL", "HSAPOL"), k),
            _pick(("EHCPOL", "PUBLICPOL", "HSAPOL"), k),
            "http://terminology.hl7.org/CodeSystem/v3-ActCode",
        ).alias("type"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias(
            "beneficiary"
        ),
        # v5: plan validity period — cancelled coverages (k%5==0) carry
        # an end date, active ones are open-ended (null end is DROPPED
        # by to_json, matching real payer feeds where `end` is absent)
        F.struct(
            F.format_string(
                "%04d-%02d-01",
                (k % 8 + 2015).cast("int"),
                (k % 12 + 1).cast("int"),
            ).alias("start"),
            F.when(
                k % 5 == 0,
                F.format_string(
                    "%04d-%02d-28",
                    (k % 8 + 2016).cast("int"),
                    ((k + 3) % 12 + 1).cast("int"),
                ),
            ).alias("end"),
        ).alias("period"),
        F.array(
            F.struct(_cat("Organization/org-", k % 4).alias("reference"))
        ).alias("payor"),
    )
    # Account.subject is 0..* Reference — every 10th account names the
    # NEXT patient too, so bridge attribution must fan the row into two
    # bundles (the compartment contract, not a coalesce).
    subj = lambda kk: F.struct(_cat("Patient/p-", kk).alias("reference"))  # noqa: E731
    account = F.struct(
        F.lit("Account").alias("resourceType"),
        _cat("acct-", k).alias("id"),
        _pick(("active", "inactive"), k).alias("status"),
        _cat("acct-name-", k % 20).alias("name"),
        F.when(k % 10 == 0, F.array(subj(k), subj(k + 1)))
        .otherwise(F.array(subj(k)))
        .alias("subject"),
    )
    allergy = F.struct(
        F.lit("AllergyIntolerance").alias("resourceType"),
        _cat("alg-", k).alias("id"),
        _pick(("allergy", "intolerance"), k).alias("type"),
        _pick(("low", "high", "unable-to-assess"), k + 1).alias(
            "criticality"
        ),
        _codeable(
            _cat("ALG", k % 15), _cat("allergen-", k % 15), SNOMED
        ).alias("code"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("patient"),
        F.format_string(
            "%04d-%02d-%02d", (k % 5 + 2018).cast("int"),
            ((k + 9) % 12 + 1).cast("int"), ((k + 14) % 28 + 1).cast("int"),
        ).alias("recordedDate"),
    )
    # OperationOutcome rows emulate a bulk export's error file: issue
    # severity/code/diagnostics closed-form; every 4th outcome carries a
    # second (warning/processing) issue.
    def issue(sev, code_, diag) -> F.Column:
        return F.struct(
            sev.alias("severity"),
            code_.alias("code"),
            diag.alias("diagnostics"),
        )

    first_issue = issue(
        _pick(("error", "warning", "information"), k),
        _pick(("not-found", "invalid", "timeout"), k + 1),
        _cat("diag-", k % 25),
    )
    second_issue = issue(
        F.lit("warning"), F.lit("processing"), _cat("retry-", k % 6)
    )
    outcome = F.struct(
        F.lit("OperationOutcome").alias("resourceType"),
        _cat("oo-", k).alias("id"),
        F.when(k % 4 == 0, F.array(first_issue, second_issue))
        .otherwise(F.array(first_issue))
        .alias("issue"),
    )
    # v7: the 3-refill medication history as an export file — SAME date
    # closed forms as the bundle corpus's v15 refill history (base +
    # k%40+10 + k%20+25 day gaps) so the DuckDB oracle macros are
    # shared; dose doubles on the final refill for every third patient
    # (k%3==0), the dose-escalation split dose_era must honor.
    med_d0 = F.format_string(
        "%04d-%02d-%02d", (k % 6 + 2018).cast("int"),
        ((k + 1) % 12 + 1).cast("int"), ((k + 7) % 28 + 1).cast("int"),
    )
    med_d1 = F.date_format(
        F.date_add(F.to_date(med_d0), (k % 40 + 10).cast("int")),
        "yyyy-MM-dd",
    )
    med_d2 = F.date_format(
        F.date_add(F.to_date(med_d1), (k % 20 + 25).cast("int")),
        "yyyy-MM-dd",
    )
    base_dose = ((k % 4 + 1) * 50).cast("double")

    def _medreq_nd(suffix: str, authored: F.Column, dose: F.Column) -> F.Column:
        return F.struct(
            F.lit("MedicationRequest").alias("resourceType"),
            F.concat(_cat("mr-", k), F.lit(suffix)).alias("id"),
            F.lit("active").alias("status"),
            F.lit("order").alias("intent"),
            F.struct(
                F.array(
                    F.struct(
                        F.lit(RXNORM).alias("system"),
                        _cat("RX", k % 30).alias("code"),
                    )
                ).alias("coding")
            ).alias("medicationCodeableConcept"),
            F.struct(_cat("Patient/p-", k).alias("reference")).alias(
                "subject"
            ),
            authored.alias("authoredOn"),
            F.array(
                F.struct(
                    F.array(
                        F.struct(
                            F.struct(
                                dose.alias("value"), F.lit("mg").alias("unit")
                            ).alias("doseQuantity")
                        )
                    ).alias("doseAndRate")
                )
            ).alias("dosageInstruction"),
        )

    medreqs = F.array(
        _medreq_nd("", med_d0, base_dose),
        _medreq_nd("-f1", med_d1, base_dose),
        _medreq_nd(
            "-f2", med_d2,
            F.when(k % 3 == 0, base_dose * 2).otherwise(base_dose),
        ),
    )
    # v8: Specimen — type coding + collection (collectedDateTime,
    # quantity in quarter-exact mL so both engines compute the same
    # double from the same expression)
    specimen = F.struct(
        F.lit("Specimen").alias("resourceType"),
        _cat("spec-", k).alias("id"),
        _pick(("available", "unavailable"), k).alias("status"),
        _codeable(
            _cat("SPEC", k % 10), _pick(("Serum", "Urine", "Whole blood"), k),
            "http://terminology.hl7.org/CodeSystem/v2-0487",
        ).alias("type"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.struct(
            F.format_string(
                "%04d-%02d-%02d", (k % 7 + 2018).cast("int"),
                ((k + 6) % 12 + 1).cast("int"),
                ((k + 17) % 28 + 1).cast("int"),
            ).alias("collectedDateTime"),
            F.struct(
                ((k % 8 + 1) * F.lit(2.5)).alias("value"),
                F.lit("mL").alias("unit"),
            ).alias("quantity"),
        ).alias("collection"),
    )
    # v8: Device + its 3-wear DeviceUseStatement history — the DUS
    # carries person + wear start, the referenced Device carries the
    # concept; wear gaps reuse the condition follow-up closed forms
    # (k%40+10 and k%20+25 straddle the 30-day persistence window) so
    # the device_era merge is data-dependent
    device_nd = F.struct(
        F.lit("Device").alias("resourceType"),
        _cat("dev-", k).alias("id"),
        _pick(("active", "inactive"), k).alias("status"),
        _codeable(_cat("DV", k % 15), _cat("devtype-", k % 15), SNOMED).alias(
            "type"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("patient"),
    )
    dus_d0 = F.format_string(
        "%04d-%02d-%02d", (k % 4 + 2021).cast("int"),
        ((k + 3) % 12 + 1).cast("int"), ((k + 14) % 28 + 1).cast("int"),
    )
    dus_d1 = F.date_format(
        F.date_add(F.to_date(dus_d0), (k % 40 + 10).cast("int")),
        "yyyy-MM-dd",
    )
    dus_d2 = F.date_format(
        F.date_add(F.to_date(dus_d1), (k % 20 + 25).cast("int")),
        "yyyy-MM-dd",
    )

    def _dus_nd(suffix: str, start: F.Column) -> F.Column:
        return F.struct(
            F.lit("DeviceUseStatement").alias("resourceType"),
            F.concat(_cat("dus-", k), F.lit(suffix)).alias("id"),
            F.lit("active").alias("status"),
            F.struct(_cat("Patient/p-", k).alias("reference")).alias(
                "subject"
            ),
            F.struct(start.alias("start")).alias("timingPeriod"),
            F.struct(_cat("Device/dev-", k).alias("reference")).alias(
                "device"
            ),
        )

    dus_history = F.array(
        _dus_nd("", dus_d0), _dus_nd("-f1", dus_d1), _dus_nd("-f2", dus_d2)
    )
    # v10: trial enrollment — one ResearchSubject per patient linking
    # Patient -> ResearchStudy/study-(k%5) with arm + status closed-form
    rsubject = F.struct(
        F.lit("ResearchSubject").alias("resourceType"),
        _cat("rs-", k).alias("id"),
        _pick(("candidate", "on-study", "completed", "withdrawn"), k)
        .alias("status"),
        F.struct(
            F.format_string(
                "%04d-%02d-01", (k % 5 + 2019).cast("int"),
                ((k + 4) % 12 + 1).cast("int"),
            ).alias("start")
        ).alias("period"),
        F.struct(_cat("ResearchStudy/study-", k % 5).alias("reference"))
        .alias("study"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias(
            "individual"
        ),
        _pick(("arm-a", "arm-b"), k).alias("assignedArm"),
    )
    # v10: one progress note per patient; the attachment payload is the
    # BASE64 of a closed-form plaintext so the OMOP note mapping must
    # actually decode it (the oracle recomputes the plaintext directly)
    note_text = F.format_string(
        "Progress note %d: patient reports condtext-%d symptoms.",
        (k % 7).cast("int"), (k % 50).cast("int"),
    )
    docref = F.struct(
        F.lit("DocumentReference").alias("resourceType"),
        _cat("note-", k).alias("id"),
        F.lit("current").alias("status"),
        _codeable(F.lit("11506-3"), F.lit("Progress note"), LOINC).alias(
            "type"
        ),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02dT09:00:00Z", (k % 6 + 2018).cast("int"),
            ((k + 5) % 12 + 1).cast("int"), ((k + 11) % 28 + 1).cast("int"),
        ).alias("date"),
        F.array(
            F.struct(
                F.struct(
                    F.lit("text/plain").alias("contentType"),
                    F.base64(F.encode(note_text, "UTF-8")).alias("data"),
                    _cat("note-title-", k % 9).alias("title"),
                ).alias("attachment")
            )
        ).alias("content"),
    )
    base = c.where(k < max_custkey)
    out = {
        "Patient": base.select(F.to_json(patient).alias("value")),
        # two selects (not one exploded array): the lab and social
        # structs have different value[x] shapes, and to_json keeps
        # each idiomatic instead of null-padding a common shape
        "Observation": base.select(
            F.to_json(observation).alias("value")
        ).unionAll(base.select(F.to_json(obs_social).alias("value"))),
        "Specimen": base.select(F.to_json(specimen).alias("value")),
        "Device": base.select(F.to_json(device_nd).alias("value")),
        "DeviceUseStatement": base.select(
            F.explode(dus_history).alias("d")
        ).select(F.to_json(col("d")).alias("value")),
        "ResearchSubject": base.select(F.to_json(rsubject).alias("value")),
        "DocumentReference": base.select(F.to_json(docref).alias("value")),
        "Condition": base.select(
            F.explode(conditions).alias("c")
        ).select(F.to_json(col("c")).alias("value")),
        "Coverage": base.select(F.to_json(coverage).alias("value")),
        "Account": base.select(F.to_json(account).alias("value")),
        "AllergyIntolerance": base.select(F.to_json(allergy).alias("value")),
        "OperationOutcome": base.select(F.to_json(outcome).alias("value")),
        "MedicationRequest": base.select(
            F.explode(medreqs).alias("m")
        ).select(F.to_json(col("m")).alias("value")),
    }
    out.update(_terminology_dfs(spark))
    out.update(_quality_dfs(spark))
    out.update(_research_dfs(spark))
    return out


# The synthetic "standard vocabulary" the ConceptMap targets — the stand-in
# for OMOP standard concepts (a real ETL maps SNOMED source codes to OMOP
# standard concept ids through exactly this translate shape).
SYNTH_STD_SYSTEM = "urn:synthetic:std-vocab"


def _terminology_dfs(spark: SparkSession) -> dict[str, DataFrame]:
    """The v6 DEFINITIONAL files (terminology trio): bounded handfuls of
    resources, built as Python dicts because a terminology feed carries
    a few definition resources, not one per patient — this is fixture
    tooling, not a per-row generation path.

    Content is closed-form so DuckDB oracles can recompute translations
    relationally: CodeSystem carries concepts C0..C49 (display
    cond-<i>); ValueSet selects the ``reportable`` subset (every 5th
    code); ConceptMap collapses C<i> onto standard code STD-<i%10>
    (display std-<i%10>, equivalence alternating equivalent/wider)."""
    import json as _json

    codesystem = {
        "resourceType": "CodeSystem",
        "id": "cs-synth-cond",
        "url": "urn:synthetic:condition-codes",
        "version": "1.0",
        "name": "SyntheticConditionCodes",
        "status": "active",
        "content": "complete",
        "concept": [
            {"code": f"C{i}", "display": f"cond-{i}",
             "definition": f"synthetic condition {i}"}
            for i in range(50)
        ],
    }
    valueset = {
        "resourceType": "ValueSet",
        "id": "vs-reportable",
        "url": "urn:synthetic:reportable-conditions",
        "version": "1.0",
        "name": "ReportableConditions",
        "status": "active",
        "compose": {
            "include": [
                {
                    "system": SNOMED,
                    "concept": [
                        {"code": f"C{i}", "display": f"cond-{i}"}
                        for i in range(0, 50, 5)
                    ],
                }
            ]
        },
    }
    conceptmap = {
        "resourceType": "ConceptMap",
        "id": "cm-cond-to-std",
        "url": "urn:synthetic:cond-to-std",
        "version": "1.0",
        "name": "CondToStandard",
        "status": "active",
        "group": [
            {
                "source": SNOMED,
                "target": SYNTH_STD_SYSTEM,
                "element": [
                    {
                        "code": f"C{i}",
                        "display": f"cond-{i}",
                        "target": [
                            {
                                "code": f"STD-{i % 10}",
                                "display": f"std-{i % 10}",
                                "equivalence": (
                                    "equivalent" if i % 2 == 0 else "wider"
                                ),
                            }
                        ],
                    }
                    for i in range(50)
                ],
            }
        ],
    }
    mk = lambda d: spark.createDataFrame(  # noqa: E731 - local shape helper
        [(_json.dumps(d, sort_keys=True),)], "value string"
    )
    return {
        "CodeSystem": mk(codesystem),
        "ValueSet": mk(valueset),
        "ConceptMap": mk(conceptmap),
    }


def _quality_dfs(spark: SparkSession) -> dict[str, DataFrame]:
    """The v9 DEFINITIONAL files (quality-measure/eCQM trio, TENTH
    promotion batch): 5 Measures, each naming its logic Library by
    canonical url (the CMS eCQM packaging shape) with a 2-population
    group; 5 Libraries with a CQL attachment stub; 5 PlanDefinitions
    whose actions reference the same libraries and carry applicability
    conditions. Bounded fixture tooling, the ``_terminology_dfs``
    pattern — closed-form in the index so the proof-row oracle
    recomputes the catalog relationally."""
    import json as _json

    scorings = ("proportion", "ratio", "cohort")
    measures = [
        {
            "resourceType": "Measure",
            "id": f"m-{i}",
            "url": f"urn:synthetic:measure/m-{i}",
            "version": f"1.{i}",
            "name": f"SyntheticMeasure{i}",
            "title": f"Synthetic Measure {i}",
            "status": "active",
            "scoring": {
                "coding": [
                    {
                        "system": (
                            "http://terminology.hl7.org/CodeSystem"
                            "/measure-scoring"
                        ),
                        "code": scorings[i % 3],
                    }
                ]
            },
            "library": [f"urn:synthetic:library/l-{i}"],
            "group": [
                {
                    "population": [
                        {
                            "code": {"coding": [{"code": pop}]},
                            "criteria": {
                                "language": "text/cql.identifier",
                                "expression": f"{pop}-{i}",
                            },
                        }
                        for pop in ("initial-population", "numerator")
                    ]
                }
            ],
        }
        for i in range(5)
    ]
    libraries = [
        {
            "resourceType": "Library",
            "id": f"l-{i}",
            "url": f"urn:synthetic:library/l-{i}",
            "version": f"2.{i}",
            "title": f"Synthetic Library {i}",
            "status": "active",
            "type": {
                "coding": [
                    {
                        "system": (
                            "http://terminology.hl7.org/CodeSystem"
                            "/library-type"
                        ),
                        "code": "logic-library",
                    }
                ]
            },
            "content": [
                {"contentType": "text/cql", "title": f"cql-{i}"}
            ],
        }
        for i in range(5)
    ]
    plans = [
        {
            "resourceType": "PlanDefinition",
            "id": f"pd-{i}",
            "url": f"urn:synthetic:plan/pd-{i}",
            "version": f"3.{i}",
            "title": f"Synthetic Plan {i}",
            "status": "active",
            "library": [f"urn:synthetic:library/l-{i}"],
            "action": [
                {
                    "title": f"step-{i}-{j}",
                    "condition": [
                        {
                            "kind": "applicability",
                            "expression": {
                                "language": "text/cql.identifier",
                                "expression": f"cond-{i}-{j}",
                            },
                        }
                    ],
                }
                for j in range(i % 2 + 1)
            ],
        }
        for i in range(5)
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731 - shape helper
        [(_json.dumps(d, sort_keys=True),) for d in rows], "value string"
    )
    return {
        "Measure": mk(measures),
        "Library": mk(libraries),
        "PlanDefinition": mk(plans),
    }


def _research_dfs(spark: SparkSession) -> dict[str, DataFrame]:
    """The v10 DEFINITIONAL file (clinical-research pair, ELEVENTH
    promotion batch): 5 ResearchStudy trial definitions with
    phase/status/arms, closed-form in the index — the protocol side
    the per-patient ResearchSubject enrollments link onto."""
    import json as _json

    phases = ("phase-1", "phase-2", "phase-3")
    statuses = ("active", "completed")
    studies = [
        {
            "resourceType": "ResearchStudy",
            "id": f"study-{i}",
            "title": f"Synthetic Trial {i}",
            "status": statuses[i % 2],
            "phase": {
                "coding": [
                    {
                        "system": (
                            "http://terminology.hl7.org/CodeSystem"
                            "/research-study-phase"
                        ),
                        "code": phases[i % 3],
                    }
                ]
            },
            "principalInvestigator": {
                "reference": f"Practitioner/prac-{i}"
            },
            "arm": [
                {"name": "arm-a", "description": f"control arm {i}"},
                {"name": "arm-b", "description": f"treatment arm {i}"},
            ],
        }
        for i in range(5)
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731 - shape helper
        [(_json.dumps(d, sort_keys=True),) for d in rows], "value string"
    )
    return {"ResearchStudy": mk(studies)}


def write_ndjson_corpus(
    spark: SparkSession, sf_dir: str, max_custkey: int = 400
) -> str:
    """Materialize ``<Type>.ndjson`` files (deterministic content, sorted
    by line) and return the directory. Idempotent via the same
    marker/rename protocol as ``write_corpus``. Bounded fixture tooling:
    a real export is written by the FHIR server, not by us."""
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(
        "/tmp/interop_spark_fixtures",
        f"ndjson-{sf_name}-k{max_custkey}-{NDJSON_VERSION}",
    )
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    dfs = ndjson_resource_dfs(spark, sf_dir, max_custkey)
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp)
    n = 0
    for rt, df in dfs.items():
        lines = sorted(r["value"] for r in df.collect())
        n += len(lines)
        with open(os.path.join(tmp, f"{rt}.ndjson"), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write(f"{n}\n")
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Round-15 EXTENSION corpus — its own version constant and directory so
# new consumers never force the main bundle/NDJSON consumer fleets back
# into the check window (the confine-changes convention: bumping
# EXT_NDJSON_VERSION re-verifies only the ext-corpus rows).
# --------------------------------------------------------------------------

EXT_NDJSON_VERSION = "v2"  # v2: +MedicationKnowledge/Contract (13th
# promotion batch) and parent/child Specimen aliquots (the OMOP
# fact_relationship source)


def ext_resource_dfs(
    spark: SparkSession, sf_dir: str, max_custkey: int = 400
) -> dict[str, DataFrame]:
    """Per-type ``value`` frames for the r15 extension corpus, all
    closed-form in c_custkey:

    - ``Encounter`` rows with 1-3 ``location`` ward-transfer segments
      (each a Location reference + per-segment Period) — the OMOP
      visit_detail source. The main bundle corpus's Encounters carry no
      location array, and extending them would bump CORPUS_VERSION for
      every bundle consumer; the ext corpus confines the change.
    - ``ActivityDefinition``: 6 order-template definitions (url +
      version + kind + code + `library` canonical array) — the
      definitional side, _research_dfs style.
    - ``RequestGroup`` per patient whose ``instantiatesCanonical``
      entries carry the canonical-with-version form
      ``<url>|<version>`` (hl7.org/fhir/R4/references.html#canonical)
      — the $apply output linking executed orders back to their
      ActivityDefinitions.
    """
    import json as _json

    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    k = col("c_custkey")
    base = c.where(k < max_custkey)

    v3 = "http://terminology.hl7.org/CodeSystem/v3-ActCode"
    enc_base = F.make_date(
        (k % 5 + 2018).cast("int"),
        ((k + 2) % 12 + 1).cast("int"),
        ((k + 7) % 28 + 1).cast("int"),
    )
    seg_len = (k % 4 + 1).cast("int")
    encounter = F.struct(
        F.lit("Encounter").alias("resourceType"),
        _cat("vd-enc-", k).alias("id"),
        _pick(("finished", "in-progress", "cancelled"), k).alias("status"),
        F.struct(
            F.lit(v3).alias("system"),
            _pick(("AMB", "IMP", "EMER"), k + 1).alias("code"),
        ).alias("class"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.struct(
            F.date_format(enc_base, "yyyy-MM-dd").alias("start"),
            F.date_format(
                F.date_add(enc_base, seg_len * ((k % 3) + 1).cast("int")),
                "yyyy-MM-dd",
            ).alias("end"),
        ).alias("period"),
        F.transform(
            F.sequence(F.lit(0), (k % 3).cast("int")),
            lambda i: F.struct(
                F.struct(
                    F.concat(
                        F.lit("Location/ward-"),
                        ((k + i) % 7).cast("string"),
                    ).alias("reference")
                ).alias("location"),
                F.when(i < (k % 3).cast("int"), F.lit("completed"))
                .otherwise(F.lit("active"))
                .alias("status"),
                F.struct(
                    F.date_format(
                        F.date_add(enc_base, i * seg_len), "yyyy-MM-dd"
                    ).alias("start"),
                    F.date_format(
                        F.date_add(enc_base, (i + 1) * seg_len),
                        "yyyy-MM-dd",
                    ).alias("end"),
                ).alias("period"),
            ),
        ).alias("location"),
    )

    n_canon = (k % 2 + 1).cast("int")
    rg = F.struct(
        F.lit("RequestGroup").alias("resourceType"),
        _cat("rg-", k).alias("id"),
        F.transform(
            F.sequence(F.lit(0), n_canon - 1),
            lambda j: F.concat(
                F.lit("http://example.org/fhir/ActivityDefinition/order-"),
                ((k + j) % 6).cast("string"),
                F.lit("|1."),
                ((k + j) % 6).cast("string"),
            ),
        ).alias("instantiatesCanonical"),
        _pick(("active", "completed", "draft"), k).alias("status"),
        F.lit("order").alias("intent"),
        _pick(("routine", "urgent", "asap"), k + 1).alias("priority"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
        F.format_string(
            "%04d-%02d-%02d", (k % 4 + 2020).cast("int"),
            ((k + 6) % 12 + 1).cast("int"), ((k + 9) % 28 + 1).cast("int"),
        ).alias("authoredOn"),
        F.array(
            F.struct(
                _cat("order ", k % 6).alias("title"),
                F.struct(
                    _cat("MedicationRequest/mr-", k).alias("reference")
                ).alias("resource"),
            )
        ).alias("action"),
    )

    # v2: parent/child Specimen aliquots — each patient's parent
    # specimen spawns k%2+1 child aliquots whose `parent` reference
    # names it; the OMOP fact_relationship source (bidirectional
    # parent-of / child-of rows)
    spec_type = _codeable(
        _cat("SPEC", k % 10), _pick(("Serum", "Urine", "Whole blood"), k),
        "http://terminology.hl7.org/CodeSystem/v2-0487",
    )
    spec_parent = F.struct(
        F.lit("Specimen").alias("resourceType"),
        _cat("espec-", k).alias("id"),
        F.lit("available").alias("status"),
        spec_type.alias("type"),
        F.struct(_cat("Patient/p-", k).alias("reference")).alias("subject"),
    )

    def _spec_child(j) -> F.Column:
        return F.struct(
            F.lit("Specimen").alias("resourceType"),
            F.concat(_cat("espec-", k), F.lit(f"-a{j}")).alias("id"),
            F.lit("available").alias("status"),
            spec_type.alias("type"),
            F.struct(_cat("Patient/p-", k).alias("reference")).alias(
                "subject"
            ),
            F.array(
                F.struct(_cat("Specimen/espec-", k).alias("reference"))
            ).alias("parent"),
        )

    # v2: per-patient payer Contract with k%3+1 terms, quarter-exact
    # valued-item nets (cents-exact * 100)
    ct_issued = F.make_date(
        (k % 6 + 2019).cast("int"),
        ((k + 4) % 12 + 1).cast("int"),
        ((k + 11) % 28 + 1).cast("int"),
    )
    contract = F.struct(
        F.lit("Contract").alias("resourceType"),
        _cat("ct-", k).alias("id"),
        _pick(("executed", "offered", "terminated"), k).alias("status"),
        F.date_format(ct_issued, "yyyy-MM-dd").alias("issued"),
        F.struct(
            F.date_format(ct_issued, "yyyy-MM-dd").alias("start"),
            F.date_format(
                F.date_add(ct_issued, (((k % 3) + 1) * 90).cast("int")),
                "yyyy-MM-dd",
            ).alias("end"),
        ).alias("applies"),
        F.array(
            F.struct(_cat("Patient/p-", k).alias("reference"))
        ).alias("subject"),
        F.struct(
            F.array(
                F.struct(
                    F.lit(
                        "http://terminology.hl7.org/CodeSystem/"
                        "contract-type"
                    ).alias("system"),
                    _pick(("healthinsurance", "privacy"), k).alias("code"),
                )
            ).alias("coding")
        ).alias("type"),
        F.transform(
            F.sequence(F.lit(0), (k % 3).cast("int")),
            lambda j: F.struct(
                F.date_format(
                    F.date_add(ct_issued, j * 30), "yyyy-MM-dd"
                ).alias("issued"),
                F.struct(
                    F.date_format(
                        F.date_add(ct_issued, j * 30), "yyyy-MM-dd"
                    ).alias("start"),
                    F.date_format(
                        F.date_add(ct_issued, (j + 1) * 30), "yyyy-MM-dd"
                    ).alias("end"),
                ).alias("applies"),
                F.struct(
                    F.array(
                        F.struct(
                            F.when((k + j) % 2 == 0, F.lit("statutory"))
                            .otherwise(F.lit("subject-to"))
                            .alias("code")
                        )
                    ).alias("coding")
                ).alias("type"),
                F.struct(
                    F.concat(
                        F.lit("offer "), _cat("", k), F.lit("-"),
                        j.cast("string"),
                    ).alias("text")
                ).alias("offer"),
                F.array(
                    F.struct(
                        F.array(
                            F.struct(
                                F.struct(
                                    (((k + j) % 20 + 1) * F.lit(2.5)).alias(
                                        "value"
                                    ),
                                    F.lit("USD").alias("currency"),
                                ).alias("net")
                            )
                        ).alias("valuedItem")
                    )
                ).alias("asset"),
            ),
        ).alias("term"),
    )

    kinds = ("ServiceRequest", "MedicationRequest")
    actdefs = [
        {
            "resourceType": "ActivityDefinition",
            "id": f"actdef-{i}",
            "url": f"http://example.org/fhir/ActivityDefinition/order-{i}",
            "version": f"1.{i}",
            "name": f"order-{i}",
            "title": f"Order template {i}",
            "status": "active" if i % 2 == 0 else "draft",
            "kind": kinds[i % 2],
            "intent": "order",
            "priority": "routine" if i % 3 else "urgent",
            "code": {
                "coding": [
                    {
                        "system": "http://snomed.info/sct",
                        "code": f"AD{i}",
                        "display": f"order-proc-{i}",
                    }
                ]
            },
            "library": [f"http://example.org/fhir/Library/lib-{i % 3}"],
        }
        for i in range(6)
    ]
    # v2: the 30-entry MedicationKnowledge formulary — one record per
    # RxNorm code the corpus's MedicationRequests carry (RX0..RX29),
    # quarter-exact list costs so cents arithmetic is integer-exact
    dose_forms = ("tablet", "capsule", "solution")
    medknow = [
        {
            "resourceType": "MedicationKnowledge",
            "id": f"mk-{i}",
            "code": {
                "coding": [
                    {
                        "system": RXNORM,
                        "code": f"RX{i}",
                        "display": f"drug-{i}",
                    }
                ]
            },
            "status": "inactive" if i % 5 == 0 else "active",
            "doseForm": {
                "coding": [
                    {
                        "system": SNOMED,
                        "code": f"DF{i % 3}",
                        "display": dose_forms[i % 3],
                    }
                ]
            },
            "amount": {"value": (i % 4 + 1) * 10.0, "unit": "mg"},
            "synonym": [f"drug-{i}-alt"],
            "cost": [
                {
                    "type": {"coding": [{"code": "list"}]},
                    "source": "formulary",
                    "cost": {
                        "value": (i % 16 + 1) * 2.5,
                        "currency": "USD",
                    },
                }
            ],
        }
        for i in range(30)
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731 - shape helper
        [(_json.dumps(d, sort_keys=True),) for d in rows], "value string"
    )
    return {
        "Encounter": base.select(F.to_json(encounter).alias("value")),
        "RequestGroup": base.select(F.to_json(rg).alias("value")),
        "ActivityDefinition": mk(actdefs),
        "MedicationKnowledge": mk(medknow),
        "Contract": base.select(F.to_json(contract).alias("value")),
        "Specimen": base.select(
            F.to_json(spec_parent).alias("value")
        ).unionByName(
            base.select(F.to_json(_spec_child(0)).alias("value"))
        ).unionByName(
            base.where(k % 2 == 0).select(
                F.to_json(_spec_child(1)).alias("value")
            )
        ),
    }


def write_ext_corpus(
    spark: SparkSession, sf_dir: str, max_custkey: int = 400
) -> str:
    """Materialize the r15 extension corpus (same marker/rename protocol
    as ``write_ndjson_corpus``) and return the directory."""
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(
        "/tmp/interop_spark_fixtures",
        f"extnd-{sf_name}-k{max_custkey}-{EXT_NDJSON_VERSION}",
    )
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    dfs = ext_resource_dfs(spark, sf_dir, max_custkey)
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp)
    n = 0
    for rt, df in dfs.items():
        lines = sorted(r["value"] for r in df.collect())
        n += len(lines)
        with open(os.path.join(tmp, f"{rt}.ndjson"), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write(f"{n}\n")
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out
