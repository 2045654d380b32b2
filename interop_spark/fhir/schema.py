"""Declared (not inferred) FHIR R4 schemas, resource-keyed and overridable.

Mirrors the reference's ``FhirSchemaModel`` semantics
(`01_dbignite_sample.py:141-146`): a ``fhir_resource_map`` of
resourceType → StructType, where a user-supplied map entry replaces that
resource's StructType wholesale — the mechanism the reference demonstrates
for tolerating non-standard FHIR (adding ``medicationCodeableConcept`` to
MedicationRequest, `01_dbignite_sample.py:118-146`).

Schemas are built from public FHIR R4 component types (Coding,
CodeableConcept, Identifier, HumanName, Address, Reference, …) and cover
every field the reference's notebook and sample bundles touch, including
``_field`` shadow elements and ``extension`` arrays
(`sampledata/adt_records/ADT_A01_FHIR.json`).

Scale note: these StructTypes are *declared*, so the reader never pays a
schema-inference pass over 100 TB of JSON, and nested-schema pruning can
drop unused subfields at the scan.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

S = StringType()
B = BooleanType()
I = IntegerType()
D = DoubleType()


def _struct(**fields) -> StructType:
    return StructType([StructField(k, v, True) for k, v in fields.items()])


def _arr(t) -> ArrayType:
    return ArrayType(t, True)


# ---- FHIR R4 component (complex) types -----------------------------------

CODING = _struct(system=S, version=S, code=S, display=S, userSelected=B)
CODEABLE_CONCEPT = _struct(coding=_arr(CODING), text=S)
PERIOD = _struct(start=S, end=S)
INNER_EXTENSION = _struct(url=S, valueString=S, valueCode=S)
EXTENSION = _struct(
    url=S,
    valueString=S,
    valueCode=S,
    extension=_arr(INNER_EXTENSION),
)
# `_system` is a FHIR shadow element carrying extensions for the primitive
# `system` field — a legal Spark field name that must not be dropped.
IDENTIFIER = _struct(
    use=S,
    type=CODEABLE_CONCEPT,
    system=S,
    _system=_struct(extension=_arr(INNER_EXTENSION)),
    value=S,
    period=PERIOD,
)
HUMAN_NAME = _struct(
    use=S, text=S, family=S, given=_arr(S), prefix=_arr(S), suffix=_arr(S)
)
CONTACT_POINT = _struct(system=S, value=S, use=S, rank=I)
ADDRESS = _struct(
    use=S,
    type=S,
    text=S,
    line=_arr(S),
    city=S,
    district=S,
    state=S,
    postalCode=S,
    country=S,
)
REFERENCE = _struct(reference=S, type=S, identifier=IDENTIFIER, display=S)
QUANTITY = _struct(value=D, unit=S, system=S, code=S)
MONEY = _struct(value=D, currency=S)
META = _struct(profile=_arr(S), versionId=S, lastUpdated=S, source=S)


def _resource(**fields) -> StructType:
    base = {"resourceType": S, "id": S, "meta": META}
    base.update(fields)
    return _struct(**base)


# ---- Resource schemas (the 14 types in evidence) --------------------------

PATIENT = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    name=_arr(HUMAN_NAME),
    telecom=_arr(CONTACT_POINT),
    gender=S,
    birthDate=S,
    deceasedBoolean=B,
    deceasedDateTime=S,
    address=_arr(ADDRESS),
    maritalStatus=CODEABLE_CONCEPT,
    multipleBirthBoolean=B,
    communication=_arr(_struct(language=CODEABLE_CONCEPT, preferred=B)),
    generalPractitioner=_arr(REFERENCE),
    managingOrganization=REFERENCE,
    extension=_arr(EXTENSION),
)

MESSAGE_HEADER = _resource(
    eventCoding=CODING,
    definition=S,
    source=_struct(name=S, software=S, version=S, endpoint=S),
    destination=_arr(_struct(name=S, endpoint=S, receiver=REFERENCE)),
    focus=_arr(REFERENCE),
    sender=REFERENCE,
    enterer=REFERENCE,
    author=REFERENCE,
    responsible=REFERENCE,
    reason=CODEABLE_CONCEPT,
)

ENCOUNTER = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    **{"class": CODING},
    type=_arr(CODEABLE_CONCEPT),
    serviceType=CODEABLE_CONCEPT,
    priority=CODEABLE_CONCEPT,
    subject=REFERENCE,
    participant=_arr(
        _struct(type=_arr(CODEABLE_CONCEPT), period=PERIOD, individual=REFERENCE)
    ),
    period=PERIOD,
    reasonCode=_arr(CODEABLE_CONCEPT),
    hospitalization=_struct(
        admitSource=CODEABLE_CONCEPT,
        dischargeDisposition=CODEABLE_CONCEPT,
        destination=REFERENCE,
    ),
    location=_arr(
        _struct(location=REFERENCE, status=S, physicalType=CODEABLE_CONCEPT)
    ),
    serviceProvider=REFERENCE,
    account=_arr(REFERENCE),
)

ACCOUNT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=CODEABLE_CONCEPT,
    name=S,
    subject=_arr(REFERENCE),
    servicePeriod=PERIOD,
    coverage=_arr(_struct(coverage=REFERENCE, priority=I)),
    owner=REFERENCE,
    description=S,
    guarantor=_arr(_struct(party=REFERENCE, onHold=B, period=PERIOD)),
)

RELATED_PERSON = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    patient=REFERENCE,
    relationship=_arr(CODEABLE_CONCEPT),
    name=_arr(HUMAN_NAME),
    telecom=_arr(CONTACT_POINT),
    gender=S,
    birthDate=S,
    address=_arr(ADDRESS),
)

ORGANIZATION = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    type=_arr(CODEABLE_CONCEPT),
    name=S,
    telecom=_arr(CONTACT_POINT),
    address=_arr(ADDRESS),
    partOf=REFERENCE,
)

PRACTITIONER = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    name=_arr(HUMAN_NAME),
    telecom=_arr(CONTACT_POINT),
    address=_arr(ADDRESS),
    gender=S,
    birthDate=S,
    qualification=_arr(
        _struct(identifier=_arr(IDENTIFIER), code=CODEABLE_CONCEPT, period=PERIOD)
    ),
)

CARE_TEAM = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    name=S,
    subject=REFERENCE,
    encounter=REFERENCE,
    participant=_arr(
        _struct(role=_arr(CODEABLE_CONCEPT), member=REFERENCE, period=PERIOD)
    ),
)

LOCATION = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    name=S,
    mode=S,
    type=_arr(CODEABLE_CONCEPT),
    telecom=_arr(CONTACT_POINT),
    address=ADDRESS,
    physicalType=CODEABLE_CONCEPT,
    partOf=REFERENCE,
)

COVERAGE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=CODEABLE_CONCEPT,
    policyHolder=REFERENCE,
    subscriber=REFERENCE,
    subscriberId=S,
    beneficiary=REFERENCE,
    dependent=S,
    relationship=CODEABLE_CONCEPT,
    period=PERIOD,
    payor=_arr(REFERENCE),
    **{"class": _arr(_struct(type=CODEABLE_CONCEPT, value=S, name=S))},
    order=I,
    network=S,
)

CONDITION = _resource(
    identifier=_arr(IDENTIFIER),
    clinicalStatus=CODEABLE_CONCEPT,
    verificationStatus=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    severity=CODEABLE_CONCEPT,
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    onsetDateTime=S,
    abatementDateTime=S,
    recordedDate=S,
)

CLAIM = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=CODEABLE_CONCEPT,
    use=S,
    patient=REFERENCE,
    billablePeriod=PERIOD,
    created=S,
    provider=REFERENCE,
    priority=CODEABLE_CONCEPT,
    prescription=REFERENCE,
    insurance=_arr(_struct(sequence=I, focal=B, coverage=REFERENCE)),
    diagnosis=_arr(
        _struct(
            sequence=I,
            diagnosisCodeableConcept=CODEABLE_CONCEPT,
            diagnosisReference=REFERENCE,
        )
    ),
    procedure=_arr(
        _struct(
            sequence=I,
            procedureCodeableConcept=CODEABLE_CONCEPT,
            procedureReference=REFERENCE,
        )
    ),
    item=_arr(
        _struct(
            sequence=I,
            productOrService=CODEABLE_CONCEPT,
            servicedPeriod=PERIOD,
            encounter=_arr(REFERENCE),
            net=MONEY,
        )
    ),
    total=MONEY,
)

# The reference demonstrates that MedicationRequest's default schema LACKS
# medicationCodeableConcept and must be user-extended
# (`01_dbignite_sample.py:118-146`); we keep the same default so the
# override path is exercised identically.
MEDICATION_REQUEST = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    intent=S,
    medicationReference=REFERENCE,
    subject=REFERENCE,
    encounter=REFERENCE,
    authoredOn=S,
    requester=REFERENCE,
    reasonReference=_arr(REFERENCE),
    dosageInstruction=_arr(
        _struct(sequence=I, text=S, asNeededBoolean=B)
    ),
)

DEFAULT_RESOURCE_MAP: dict[str, StructType] = {
    "Patient": PATIENT,
    "MessageHeader": MESSAGE_HEADER,
    "Encounter": ENCOUNTER,
    "Account": ACCOUNT,
    "RelatedPerson": RELATED_PERSON,
    "Organization": ORGANIZATION,
    "Practitioner": PRACTITIONER,
    "CareTeam": CARE_TEAM,
    "Location": LOCATION,
    "Coverage": COVERAGE,
    "Condition": CONDITION,
    "Claim": CLAIM,
    "MedicationRequest": MEDICATION_REQUEST,
}


class FhirSchemaModel:
    """Resource-keyed schema registry with wholesale per-resource override.

    ``FhirSchemaModel()`` → R4 defaults for the 13 resource types in
    evidence. ``FhirSchemaModel(fhir_resource_map={...})`` → the user map
    is taken as-is (matching the reference's usage where the caller passes
    the full merged map, `01_dbignite_sample.py:145-146`).
    """

    def __init__(self, fhir_resource_map: dict[str, StructType] | None = None):
        if fhir_resource_map is None:
            fhir_resource_map = dict(DEFAULT_RESOURCE_MAP)
        self.fhir_resource_map = dict(fhir_resource_map)

    def resource_types(self) -> list[str]:
        return list(self.fhir_resource_map.keys())

    def schema(self, resource_type: str) -> StructType:
        return self.fhir_resource_map[resource_type]

    def with_overrides(self, overrides: dict[str, StructType]) -> "FhirSchemaModel":
        """Convenience: defaults merged with per-resource replacements."""
        merged = dict(self.fhir_resource_map)
        merged.update(overrides)
        return FhirSchemaModel(fhir_resource_map=merged)
