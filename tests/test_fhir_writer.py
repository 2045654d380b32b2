"""Writer path: relational rows → FHIR bundle JSON (reference
`01_dbignite_sample.py:495-602`), including the encoder-override split and
the reader round-trip (writer ∘ reader ≈ identity on mapped paths)."""

from __future__ import annotations

import json

import pytest

HCPCS_URI = "http://www.cms.gov/Medicare/Coding/HCPCSReleaseCodeSets"
ICD9_URI = "http://hl7.org/fhir/sid/icd-9-cm"


@pytest.fixture(scope="module")
def synpuf_df(spark):
    # F4 fixture shape (FIXTURES.md): ben_sum ⋈ car_claims source rows
    rows = [
        ("P0001", "1923-05-01", "26950", 737363357976870, "A123,B456", "99213",
         "4019", "2724"),
        ("P0002", "1943-01-01", "26970", 737363357976871, "G0008", None,
         "25000", None),
    ]
    return spark.createDataFrame(
        rows,
        "DESYNPUF_ID string, BENE_BIRTH_DT string, BENE_COUNTY_CD string,"
        "CLM_ID bigint, HCPCS_CD_1 string, HCPCS_CD_2 string,"
        "ICD9_DGNS_CD_1 string, ICD9_DGNS_CD_2 string",
    )


@pytest.fixture(scope="module")
def fhir_result(spark, synpuf_df):
    from interop_spark.fhir import (
        Bundle,
        FhirEncoder,
        FhirEncoderManager,
        Mapping,
        MappingManager,
    )

    maps = [
        Mapping("DESYNPUF_ID", "Patient.id"),
        Mapping("BENE_BIRTH_DT", "Patient.birthDate"),
        Mapping("BENE_COUNTY_CD", "Patient.address.postalCode"),
        Mapping("CLM_ID", "Claim.id"),
        Mapping("HCPCS_CD_1", "Claim.procedure.procedureCodeableConcept.coding.code"),
        Mapping("HCPCS_CD_2", "Claim.procedure.procedureCodeableConcept.coding.code"),
        Mapping("ICD9_DGNS_CD_1", "Claim.diagnosis.diagnosisCodeableConcept.coding.code"),
        Mapping("ICD9_DGNS_CD_2", "Claim.diagnosis.diagnosisCodeableConcept.coding.code"),
    ]
    # the reference's lambda VERBATIM (`01_dbignite_sample.py:534-536`):
    # x is the partially-built target value (a list of dicts), not the
    # raw source cell — a user porting their encoder must not need edits
    em = FhirEncoderManager(
        override_encoders={
            "Claim.procedure.procedureCodeableConcept.coding": FhirEncoder(
                False,
                False,
                lambda x: [
                    {"code": y, "system": HCPCS_URI}
                    for y in x[0].get("code").split(",")
                ],
            )
        }
    )
    mm = MappingManager(maps, synpuf_df.schema, em)
    return [json.loads(s) for s in Bundle(mm).df_to_fhir(synpuf_df).collect()]


def test_bundle_shape(fhir_result):
    assert len(fhir_result) == 2
    for b in fhir_result:
        assert b["resourceType"] == "Bundle"
        types = [e["resource"]["resourceType"] for e in b["entry"]]
        assert sorted(types) == ["Claim", "Patient"]


def _resource(bundle, rt):
    return next(e["resource"] for e in bundle["entry"]
                if e["resource"]["resourceType"] == rt)


def test_patient_mapping(fhir_result):
    p = _resource(fhir_result[0], "Patient")
    assert p["id"] == "P0001"
    assert p["birthDate"] == "1923-05-01"
    # address is a repeated FHIR element → single-element array
    assert p["address"] == [{"postalCode": "26950"}]


def test_claim_multisource_fanout(fhir_result):
    """Two HCPCS source columns → two procedure entries; two ICD9 columns →
    two diagnosis entries (`01_dbignite_sample.py:524-528`)."""
    c = _resource(fhir_result[0], "Claim")
    assert c["id"] == "737363357976870"
    diags = [d["diagnosisCodeableConcept"]["coding"][0]["code"]
             for d in c["diagnosis"]]
    assert diags == ["4019", "2724"]


def test_encoder_override_split(fhir_result):
    """Encoder splits 'A123,B456' into two coding dicts with the hardcoded
    system URI (`01_dbignite_sample.py:534-539`)."""
    c = _resource(fhir_result[0], "Claim")
    first_proc_coding = c["procedure"][0]["procedureCodeableConcept"]["coding"]
    assert first_proc_coding == [
        {"code": "A123", "system": HCPCS_URI},
        {"code": "B456", "system": HCPCS_URI},
    ]


def test_null_source_dropped(fhir_result):
    """Row 2 has NULL HCPCS_CD_2 / ICD9_DGNS_CD_2 → no empty elements."""
    c = _resource(fhir_result[1], "Claim")
    diags = [d["diagnosisCodeableConcept"]["coding"][0].get("code")
             for d in c["diagnosis"]]
    assert "25000" in diags and None not in diags


def test_round_trip_reader(spark, fhir_result, tmp_path):
    """writer ∘ reader ≈ identity on mapped paths (SURVEY.md §5.4)."""
    from interop_spark.fhir import read_from_directory

    d = tmp_path / "emitted"
    d.mkdir()
    for i, b in enumerate(fhir_result):
        (d / f"bundle_{i}.json").write_text(json.dumps(b))
    entry = read_from_directory(str(d), spark=spark).entry()
    pats = entry.selectExpr("explode(Patient) AS p").select("p.id", "p.birthDate")
    got = {(r.id, r.birthDate) for r in pats.collect()}
    assert got == {("P0001", "1923-05-01"), ("P0002", "1943-01-01")}
    claims = entry.selectExpr("explode(Claim) AS c").select("c.id")
    assert {r.id for r in claims.collect()} == {
        "737363357976870", "737363357976871"
    }


def test_mapping_validation(spark, synpuf_df):
    from interop_spark.fhir import Mapping, MappingManager

    with pytest.raises(ValueError, match="NOT_A_COL"):
        MappingManager([Mapping("NOT_A_COL", "Patient.id")], synpuf_df.schema)


def test_encoder_nonlist_return_wrapped(spark, synpuf_df):
    """An encoder returning a dict at a repeated path must still emit a
    JSON array (FHIR cardinality 0..*), not a bare object."""
    import json as _json

    from interop_spark.fhir import (
        Bundle,
        FhirEncoder,
        FhirEncoderManager,
        Mapping,
        MappingManager,
    )

    maps = [Mapping("HCPCS_CD_1",
                    "Claim.procedure.procedureCodeableConcept.coding.code")]
    em = FhirEncoderManager(
        override_encoders={
            "Claim.procedure.procedureCodeableConcept.coding": FhirEncoder(
                False, False,
                lambda x: {"code": x[0].get("code"), "system": HCPCS_URI},
            )
        }
    )
    mm = MappingManager(maps, synpuf_df.schema, em)
    out = [_json.loads(s) for s in Bundle(mm).df_to_fhir(synpuf_df).collect()]
    coding = out[0]["entry"][0]["resource"]["procedure"][0][
        "procedureCodeableConcept"]["coding"]
    assert isinstance(coding, list)
    assert coding[0]["code"] == "A123,B456"


def test_encoder_exception_propagates(spark, synpuf_df):
    """A buggy encoder lambda must fail the job loudly (with the path in
    the message), never silently emit defaults."""
    from interop_spark.fhir import (
        Bundle,
        FhirEncoder,
        FhirEncoderManager,
        Mapping,
        MappingManager,
    )

    maps = [Mapping("HCPCS_CD_1",
                    "Claim.procedure.procedureCodeableConcept.coding.code")]
    em = FhirEncoderManager(
        override_encoders={
            "Claim.procedure.procedureCodeableConcept.coding": FhirEncoder(
                False, False, lambda x: x.undefined_attr,
            )
        }
    )
    mm = MappingManager(maps, synpuf_df.schema, em)
    with pytest.raises(Exception, match="procedureCodeableConcept.coding"):
        Bundle(mm).df_to_fhir(synpuf_df).collect()


def test_writer_deep_paths_period_reference_money(spark):
    """Deep non-repeated components one level past the notebook's demo
    paths (`01_dbignite_sample.py:520-539`): Period start/end, Reference
    string, typed Money value and positiveInt sequence — numerics/bools
    must serialize as JSON numbers/booleans, not strings."""
    import json as _json

    from interop_spark.fhir import Bundle, Mapping, MappingManager

    src = spark.createDataFrame(
        [("c1", "2023-01-01", "2023-02-01", "Patient/p9", 123.45, 2, True)],
        "CLM string, PSTART string, PEND string, PREF string,"
        "AMOUNT double, SEQ int, ACTIVE boolean",
    )
    maps = [
        Mapping("CLM", "Claim.id"),
        Mapping("PSTART", "Claim.billablePeriod.start"),
        Mapping("PEND", "Claim.billablePeriod.end"),
        Mapping("PREF", "Claim.patient.reference"),
        Mapping("AMOUNT", "Claim.total.value"),
        Mapping("SEQ", "Claim.item.sequence"),
        Mapping("ACTIVE", "Patient.active"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()
    bundle = _json.loads(out[0].value)
    res = {e["resource"]["resourceType"]: e["resource"]
           for e in bundle["entry"]}
    claim = res["Claim"]
    assert claim["billablePeriod"] == {"start": "2023-01-01",
                                       "end": "2023-02-01"}
    assert claim["patient"] == {"reference": "Patient/p9"}
    assert claim["total"] == {"value": 123.45}          # JSON number
    assert claim["item"] == [{"sequence": 2}]           # positiveInt array
    assert res["Patient"]["active"] is True             # JSON boolean


@pytest.mark.parametrize("start,end,ref", [
    ("1900-01-01", "1900-01-02", "Patient/x"),
    ("2023-12-31", "2024-01-01", "Organization/abc-123"),
])
def test_writer_reader_roundtrip_period_reference(spark, tmp_path, start, end, ref):
    """writer ∘ reader ≈ identity on Period/Reference paths."""
    import json as _json

    from interop_spark.fhir import (
        Bundle,
        Mapping,
        MappingManager,
        read_from_directory,
    )

    src = spark.createDataFrame(
        [("e1", start, end, ref)],
        "EID string, PSTART string, PEND string, SREF string",
    )
    maps = [
        Mapping("EID", "Encounter.id"),
        Mapping("PSTART", "Encounter.period.start"),
        Mapping("PEND", "Encounter.period.end"),
        Mapping("SREF", "Encounter.subject.reference"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()
    d = tmp_path / f"rt_{start}"
    d.mkdir()
    (d / "b.json").write_text(out[0].value)
    entry = read_from_directory(str(d), spark=spark).entry()
    row = entry.selectExpr("explode(Encounter) AS e").select(
        "e.id", "e.period.start", "e.period.end", "e.subject.reference"
    ).collect()[0]
    assert tuple(row) == ("e1", start, end, ref)


US_CORE_RACE = (
    "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race"
)
US_CORE_ETHNICITY = (
    "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity"
)


def test_extension_encoding_roundtrip(spark, tmp_path):
    """Writer `extension` element support (us-core-race/ethnicity shape
    from `sampledata/adt_records/ADT_A01_FHIR.json`): literal url
    discriminators + data-column valueStrings, nested one level, then
    read back through the reader (writer ∘ reader ≈ identity). The row
    with a NULL ethnicity must emit only the race extension."""
    from interop_spark.fhir import (
        Bundle,
        Mapping,
        MappingManager,
        read_from_directory,
    )

    src = spark.createDataFrame(
        [("p1", "White", "Not Hispanic or Latino"), ("p2", "Asian", None)],
        "PID string, RACE_TEXT string, ETH_TEXT string",
    )
    maps = [
        Mapping("PID", "Patient.id"),
        Mapping(US_CORE_RACE, "Patient.extension.url", literal=True),
        Mapping("text", "Patient.extension.extension.url", literal=True),
        Mapping("RACE_TEXT", "Patient.extension.extension.valueString"),
        Mapping(US_CORE_ETHNICITY, "Patient.extension.url", literal=True),
        Mapping("text", "Patient.extension.extension.url", literal=True),
        Mapping("ETH_TEXT", "Patient.extension.extension.valueString"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()

    # raw JSON shape first (independent of the reader's schema)
    by_id = {}
    for r in out:
        b = json.loads(r.value)
        res = b["entry"][0]["resource"]
        by_id[res["id"]] = res.get("extension", [])
    assert [e["url"] for e in by_id["p1"]] == [US_CORE_RACE, US_CORE_ETHNICITY]
    assert by_id["p1"][0]["extension"] == [
        {"url": "text", "valueString": "White"}
    ]
    assert by_id["p1"][1]["extension"] == [
        {"url": "text", "valueString": "Not Hispanic or Latino"}
    ]
    # NULL ethnicity → that extension entry dropped despite its literals
    assert [e["url"] for e in by_id["p2"]] == [US_CORE_RACE]

    # reader round-trip: the declared Patient schema carries extension[]
    d = tmp_path / "ext_rt"
    d.mkdir()
    for i, r in enumerate(out):
        (d / f"b{i}.json").write_text(r.value)
    entry = read_from_directory(str(d), spark=spark).entry()
    rows = (
        entry.selectExpr("explode(Patient) AS p")
        .selectExpr(
            "p.id AS id",
            "transform(p.extension, e -> e.url) AS urls",
            "transform(p.extension, e -> e.extension[0].valueString) AS vals",
        )
        .collect()
    )
    got = {r["id"]: (r["urls"], r["vals"]) for r in rows}
    assert got["p1"] == (
        [US_CORE_RACE, US_CORE_ETHNICITY],
        ["White", "Not Hispanic or Latino"],
    )
    assert got["p2"] == ([US_CORE_RACE], ["Asian"])


def test_writer_reader_roundtrip_unitprice_multiplebirth(spark, tmp_path):
    """writer ∘ reader ≈ identity on the round-4 typed deep paths:
    Claim.item.unitPrice.value (decimal inside a repeated item) and
    Patient.multipleBirthInteger (integer-valued choice field) — both
    must survive as JSON numbers and re-read through the declared
    catalog schemas with their numeric types intact."""
    import json as _json

    from interop_spark.fhir import (
        Bundle,
        Mapping,
        MappingManager,
        read_from_directory,
    )

    src = spark.createDataFrame(
        [("p1", 3, "c1", 19.99, 1), ("p2", 0, "c2", 250.5, 2)],
        "PID string, MBI int, CLM string, UNIT double, SEQ int",
    )
    maps = [
        Mapping("PID", "Patient.id"),
        Mapping("MBI", "Patient.multipleBirthInteger"),
        Mapping("CLM", "Claim.id"),
        Mapping("UNIT", "Claim.item.unitPrice.value"),
        Mapping("SEQ", "Claim.item.sequence"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()
    # JSON numbers, not strings
    b0 = _json.loads(out[0].value)
    res = {e["resource"]["resourceType"]: e["resource"] for e in b0["entry"]}
    assert isinstance(res["Patient"]["multipleBirthInteger"], int)
    assert isinstance(res["Claim"]["item"][0]["unitPrice"]["value"], float)

    d = tmp_path / "rt_unit"
    d.mkdir()
    for i, r in enumerate(out):
        (d / f"b{i}.json").write_text(r.value)
    entry = read_from_directory(str(d), spark=spark).entry()
    got = {
        (r.pid, r.mbi, r.cid, r.unit, r.seq)
        for r in entry.selectExpr(
            "explode(Patient) AS p", "Claim"
        ).selectExpr(
            "p.id AS pid",
            "p.multipleBirthInteger AS mbi",
            "Claim[0].id AS cid",
            "Claim[0].item[0].unitPrice.value AS unit",
            "Claim[0].item[0].sequence AS seq",
        ).collect()
    }
    assert got == {("p1", 3, "c1", 19.99, 1), ("p2", 0, "c2", 250.5, 2)}


def test_writer_urn_value_leaves(spark):
    """R4 oid/uuid value-space normalization on urn-valued uri leaves:
    a bare OID gets urn:oid:, a bare UUID gets urn:uuid:, and scheme'd
    or free-text system ids pass through untouched."""
    import json as _json

    from interop_spark.fhir import Bundle, Mapping, MappingManager

    src = spark.createDataFrame(
        [
            (
                "p1",
                "2.16.840.1.113883.4.1",
                "123-45-6789",
                "c1",
                "0f8fad5b-d9cb-469f-a165-70867728950e",
            ),
            ("p2", "http://hl7.org/fhir/sid/us-ssn", "987", "c2", "mrn-local"),
        ],
        "PID string, SYS string, VAL string, CLM string, CSYS string",
    )
    maps = [
        Mapping("PID", "Patient.id"),
        Mapping("SYS", "Patient.identifier.system"),
        Mapping("VAL", "Patient.identifier.value"),
        Mapping("CLM", "Claim.id"),
        Mapping("CSYS", "Claim.identifier.system"),
        Mapping("CLM", "Claim.identifier.value"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()
    rows = {}
    for r in out:
        b = _json.loads(r.value)
        res = {e["resource"]["resourceType"]: e["resource"] for e in b["entry"]}
        rows[res["Patient"]["id"]] = res
    assert (
        rows["p1"]["Patient"]["identifier"][0]["system"]
        == "urn:oid:2.16.840.1.113883.4.1"
    )
    assert rows["p1"]["Patient"]["identifier"][0]["value"] == "123-45-6789"
    assert (
        rows["p1"]["Claim"]["identifier"][0]["system"]
        == "urn:uuid:0f8fad5b-d9cb-469f-a165-70867728950e"
    )
    # scheme'd URI and free-text ids must NOT be prefixed
    assert (
        rows["p2"]["Patient"]["identifier"][0]["system"]
        == "http://hl7.org/fhir/sid/us-ssn"
    )
    assert rows["p2"]["Claim"]["identifier"][0]["system"] == "mrn-local"


def test_writer_attachment_base64_leaves(spark):
    """Round-10 Attachment path: a raw-content source mapped to
    Attachment.data is emitted as its base64 (string source => UTF-8
    bytes; binary source => those bytes), size is a JSON number, url a
    plain passthrough, and the repeated `content` segment wraps the
    attachment in an array."""
    import base64 as _b64
    import json as _json

    from interop_spark.fhir import Bundle, Mapping, MappingManager

    src = spark.createDataFrame(
        [("d1", "hello attachment", 17, "http://x.example/d1")],
        "DID string, NOTE string, SZ int, URL string",
    )
    maps = [
        Mapping("DID", "DocumentReference.id"),
        Mapping(
            "text/plain",
            "DocumentReference.content.attachment.contentType",
            literal=True,
        ),
        Mapping("NOTE", "DocumentReference.content.attachment.data"),
        Mapping("SZ", "DocumentReference.content.attachment.size"),
        Mapping("URL", "DocumentReference.content.attachment.url"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()
    b = _json.loads(out[0].value)
    doc = b["entry"][0]["resource"]
    att = doc["content"][0]["attachment"]
    assert isinstance(doc["content"], list)
    assert att["contentType"] == "text/plain"
    assert att["data"] == _b64.b64encode(b"hello attachment").decode()
    assert att["size"] == 17 and isinstance(att["size"], int)
    assert att["url"] == "http://x.example/d1"


def test_writer_binary_source_base64(spark):
    """A BINARY-typed source through an Attachment.data leaf encodes the
    raw bytes (incl. non-UTF8) rather than a stringified repr."""
    import base64 as _b64
    import json as _json

    from interop_spark.fhir import Bundle, Mapping, MappingManager

    payload = bytes([0, 1, 2, 254, 255])
    src = spark.createDataFrame(
        [("m1", payload)], "MID string, BLOB binary"
    )
    maps = [
        Mapping("MID", "Media.id"),
        Mapping("BLOB", "Media.content.data"),
    ]
    out = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src).collect()
    b = _json.loads(out[0].value)
    media = b["entry"][0]["resource"]
    # Media.content is 1..1 in R4 — the _NONREPEATED_PATHS override must
    # keep it a single Attachment object, not an array
    assert isinstance(media["content"], dict)
    assert media["content"]["data"] == _b64.b64encode(payload).decode()


def test_ndjson_writer_roundtrip(spark, synpuf_df, tmp_path):
    """Relational rows → ``write_fhir_ndjson`` → ``read_from_ndjson`` ≈
    identity on mapped paths — the $export-layout reverse of the bundle
    roundtrip (one splittable line per RESOURCE instead of one bundle
    string per row; the 100 TB-native output format)."""
    from interop_spark.fhir import (
        Bundle,
        Mapping,
        MappingManager,
        read_from_ndjson,
    )

    maps = [
        Mapping("DESYNPUF_ID", "Patient.id"),
        Mapping("BENE_BIRTH_DT", "Patient.birthDate"),
        Mapping("BENE_COUNTY_CD", "Patient.address.postalCode"),
        Mapping("CLM_ID", "Claim.id"),
    ]
    mm = MappingManager(maps, synpuf_df.schema)
    b = Bundle(mm)

    # (resourceType, value) frame: one line per mapped resource per row
    nd = b.df_to_fhir_ndjson_df(synpuf_df)
    assert nd.columns == ["resourceType", "value"]
    per_type = {
        r.resourceType: r.n
        for r in nd.groupBy("resourceType").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    assert per_type == {"Patient": 2, "Claim": 2}

    loc = str(tmp_path / "export")
    b.write_fhir_ndjson(synpuf_df, loc)

    pats = read_from_ndjson(loc + "/Patient", spark=spark).resource("Patient")
    got = {
        (r.id, r.birthDate) for r in pats.select("id", "birthDate").collect()
    }
    assert got == {("P0001", "1923-05-01"), ("P0002", "1943-01-01")}
    pc = {r[0] for r in pats.selectExpr("address[0].postalCode").collect()}
    assert pc == {"26950", "26970"}

    claims = read_from_ndjson(loc + "/Claim", spark=spark).resource("Claim")
    assert {r.id for r in claims.select("id").collect()} == {
        "737363357976870",
        "737363357976871",
    }
    # resourceType tag filter: the Patient directory yields no Claims
    assert (
        read_from_ndjson(loc + "/Patient", spark=spark)
        .resource("Claim")
        .count()
        == 0
    )


def test_ndjson_emit_honors_encoder_overrides(spark, synpuf_df):
    """The NDJSON emitter shares the mapping/encoder compile core with
    the bundle emitter (_resource_columns): a path-keyed FhirEncoder
    override (the reference's comma-split lambda) must shape the
    emitted resource lines exactly as it shapes bundle entries."""
    import json as _json

    from interop_spark.fhir import (
        Bundle,
        FhirEncoder,
        FhirEncoderManager,
        Mapping,
        MappingManager,
    )

    maps = [
        Mapping("DESYNPUF_ID", "Patient.id"),
        Mapping("CLM_ID", "Claim.id"),
        Mapping(
            "HCPCS_CD_1",
            "Claim.procedure.procedureCodeableConcept.coding.code",
        ),
    ]
    em = FhirEncoderManager(
        override_encoders={
            "Claim.procedure.procedureCodeableConcept.coding": FhirEncoder(
                False,
                False,
                lambda x: [
                    {"code": y, "system": HCPCS_URI}
                    for y in x[0].get("code").split(",")
                ],
            )
        }
    )
    nd = Bundle(MappingManager(maps, synpuf_df.schema, em)).df_to_fhir_ndjson_df(
        synpuf_df
    )
    claims = [
        _json.loads(r.value)
        for r in nd.where("resourceType = 'Claim'").collect()
    ]
    assert len(claims) == 2
    codings = [
        c
        for cl in claims
        for proc in cl["procedure"]
        for c in proc["procedureCodeableConcept"]["coding"]
    ]
    # the comma-joined source cell 'A123,B456' splits into two codings
    assert {c["code"] for c in codings} == {"A123", "B456", "G0008"}
    assert all(c["system"] == HCPCS_URI for c in codings)


def test_default_writer_paths_compile_to_zero_python_udfs(spark, synpuf_df):
    """r18 verdict item 4 — pin the FhirEncoder fallback boundary: a
    writer mapping WITHOUT overrides compiles end-to-end to JVM Column
    expressions, ZERO Python UDFs in the executed plan (SURVEY §3 EP3;
    the scoped override fallback in fhir/writer.py is the ONLY place
    Python may enter the write path). The override twin proves the
    detector actually fires, so a future change routing default paths
    through F.udf fails this test rather than silently de-vectorizing
    every write."""
    from interop_spark.fhir import (
        Bundle,
        FhirEncoder,
        FhirEncoderManager,
        Mapping,
        MappingManager,
    )

    maps = [
        Mapping("DESYNPUF_ID", "Patient.id"),
        Mapping("BENE_BIRTH_DT", "Patient.birthDate"),
        Mapping("BENE_COUNTY_CD", "Patient.address.postalCode"),
        Mapping("CLM_ID", "Claim.id"),
        Mapping("HCPCS_CD_1",
                "Claim.procedure.procedureCodeableConcept.coding.code"),
        Mapping("ICD9_DGNS_CD_1",
                "Claim.diagnosis.diagnosisCodeableConcept.coding.code"),
    ]

    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    mm = MappingManager(maps, synpuf_df.schema)  # no overrides
    b = Bundle(mm)
    for frame in (
        b.df_to_fhir_df(synpuf_df),
        b.df_to_fhir_ndjson_df(synpuf_df),
    ):
        p = _plan(frame)
        assert "BatchEvalPython" not in p, p[:2000]
        assert "pythonudf" not in p.lower(), p[:2000]

    # control: WITH an override the Python eval node MUST appear
    em = FhirEncoderManager(
        override_encoders={
            "Claim.procedure.procedureCodeableConcept.coding": FhirEncoder(
                False, False, lambda x: x
            )
        }
    )
    p = _plan(
        Bundle(MappingManager(maps, synpuf_df.schema, em)).df_to_fhir_df(
            synpuf_df
        )
    )
    assert "BatchEvalPython" in p or "pythonudf" in p.lower(), p[:2000]
