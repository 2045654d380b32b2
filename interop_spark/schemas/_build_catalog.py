"""Catalog builder — regenerates the JSON schema data files in this
directory (`<ResourceType>.json`, Spark ``StructType.jsonValue()`` format).

The engine NEVER imports this module: `fhir/schema.py` loads the JSON
files directly (SURVEY §7.2 "schemas as data files, not code"). This
script is the provenance of those files — rerun it after editing a
resource definition:

    python -m interop_spark.schemas._build_catalog

Definitions are hand-derived from the public FHIR R4 specification
(hl7.org/fhir/R4): the 13 resource types the reference's notebook and
sample bundles touch (`01_dbignite_sample.py:141-146`,
`sampledata/adt_records/ADT_A01_FHIR.json`) plus the types a real
Synthea export contains (reference `README.md:31` names Observation /
Immunization / DiagnosticReport / Procedure bundles) and the common
companions (CarePlan, AllergyIntolerance, Device, Goal, Medication,
ImagingStudy, SupplyDelivery, ExplanationOfBenefit, DocumentReference,
Provenance) — so pointing ``read_from_directory`` at real Synthea
output yields typed columns instead of silently dropping resources.
"""

from __future__ import annotations

import json
import os

from interop_spark.fhir.schema import (
    ADDRESS,
    ANNOTATION,
    ATTACHMENT,
    CODEABLE_CONCEPT,
    CODING,
    CONTACT_POINT,
    EXTENSION,
    HUMAN_NAME,
    IDENTIFIER,
    MONEY,
    PERIOD,
    QUANTITY,
    REFERENCE,
    B,
    D,
    I,
    S,
    _arr,
    _resource,
    _struct,
)

# ---- the 13 resource types in evidence in the reference -------------------

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
    multipleBirthInteger=I,
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
    # R4 Location.position / managingOrganization (hl7.org/fhir/R4/
    # location.html) — the OMOP location/care_site mapping sources
    position=_struct(longitude=D, latitude=D, altitude=D),
    managingOrganization=REFERENCE,
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
            unitPrice=MONEY,
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

# ---- the Synthea types (reference README.md:31) ----------------------------

OBSERVATION = _resource(
    identifier=_arr(IDENTIFIER),
    basedOn=_arr(REFERENCE),
    status=S,
    category=_arr(CODEABLE_CONCEPT),
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    effectiveDateTime=S,
    effectivePeriod=PERIOD,
    issued=S,
    performer=_arr(REFERENCE),
    valueQuantity=QUANTITY,
    valueCodeableConcept=CODEABLE_CONCEPT,
    valueString=S,
    valueBoolean=B,
    valueInteger=I,
    dataAbsentReason=CODEABLE_CONCEPT,
    interpretation=_arr(CODEABLE_CONCEPT),
    note=_arr(ANNOTATION),
    bodySite=CODEABLE_CONCEPT,
    method=CODEABLE_CONCEPT,
    referenceRange=_arr(
        _struct(low=QUANTITY, high=QUANTITY, type=CODEABLE_CONCEPT, text=S)
    ),
    component=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            valueQuantity=QUANTITY,
            valueCodeableConcept=CODEABLE_CONCEPT,
            valueString=S,
            dataAbsentReason=CODEABLE_CONCEPT,
        )
    ),
)

PROCEDURE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    statusReason=CODEABLE_CONCEPT,
    category=CODEABLE_CONCEPT,
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    performedDateTime=S,
    performedPeriod=PERIOD,
    recorder=REFERENCE,
    asserter=REFERENCE,
    performer=_arr(
        _struct(function=CODEABLE_CONCEPT, actor=REFERENCE, onBehalfOf=REFERENCE)
    ),
    location=REFERENCE,
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    bodySite=_arr(CODEABLE_CONCEPT),
    outcome=CODEABLE_CONCEPT,
    report=_arr(REFERENCE),
    note=_arr(ANNOTATION),
)

IMMUNIZATION = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    statusReason=CODEABLE_CONCEPT,
    vaccineCode=CODEABLE_CONCEPT,
    patient=REFERENCE,
    encounter=REFERENCE,
    occurrenceDateTime=S,
    recorded=S,
    primarySource=B,
    location=REFERENCE,
    manufacturer=REFERENCE,
    lotNumber=S,
    expirationDate=S,
    site=CODEABLE_CONCEPT,
    route=CODEABLE_CONCEPT,
    doseQuantity=QUANTITY,
    performer=_arr(_struct(function=CODEABLE_CONCEPT, actor=REFERENCE)),
    note=_arr(ANNOTATION),
    reasonCode=_arr(CODEABLE_CONCEPT),
    protocolApplied=_arr(
        _struct(
            series=S,
            doseNumberPositiveInt=I,
            targetDisease=_arr(CODEABLE_CONCEPT),
        )
    ),
)

DIAGNOSTIC_REPORT = _resource(
    identifier=_arr(IDENTIFIER),
    basedOn=_arr(REFERENCE),
    status=S,
    category=_arr(CODEABLE_CONCEPT),
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    effectiveDateTime=S,
    effectivePeriod=PERIOD,
    issued=S,
    performer=_arr(REFERENCE),
    resultsInterpreter=_arr(REFERENCE),
    result=_arr(REFERENCE),
    conclusion=S,
    conclusionCode=_arr(CODEABLE_CONCEPT),
    presentedForm=_arr(ATTACHMENT),
)

# ---- common companions in real exports -------------------------------------

ALLERGY_INTOLERANCE = _resource(
    identifier=_arr(IDENTIFIER),
    clinicalStatus=CODEABLE_CONCEPT,
    verificationStatus=CODEABLE_CONCEPT,
    type=S,
    category=_arr(S),
    criticality=S,
    code=CODEABLE_CONCEPT,
    patient=REFERENCE,
    encounter=REFERENCE,
    onsetDateTime=S,
    recordedDate=S,
    recorder=REFERENCE,
    note=_arr(ANNOTATION),
    reaction=_arr(
        _struct(
            substance=CODEABLE_CONCEPT,
            manifestation=_arr(CODEABLE_CONCEPT),
            severity=S,
        )
    ),
)

CARE_PLAN = _resource(
    identifier=_arr(IDENTIFIER),
    basedOn=_arr(REFERENCE),
    status=S,
    intent=S,
    category=_arr(CODEABLE_CONCEPT),
    title=S,
    description=S,
    subject=REFERENCE,
    encounter=REFERENCE,
    period=PERIOD,
    created=S,
    author=REFERENCE,
    careTeam=_arr(REFERENCE),
    addresses=_arr(REFERENCE),
    goal=_arr(REFERENCE),
    activity=_arr(
        _struct(
            outcomeCodeableConcept=_arr(CODEABLE_CONCEPT),
            detail=_struct(
                code=CODEABLE_CONCEPT,
                status=S,
                location=REFERENCE,
                description=S,
            ),
        )
    ),
)

DEVICE = _resource(
    identifier=_arr(IDENTIFIER),
    udiCarrier=_arr(
        _struct(deviceIdentifier=S, issuer=S, jurisdiction=S, carrierHRF=S)
    ),
    status=S,
    manufacturer=S,
    manufactureDate=S,
    expirationDate=S,
    lotNumber=S,
    serialNumber=S,
    deviceName=_arr(_struct(name=S, type=S)),
    modelNumber=S,
    type=CODEABLE_CONCEPT,
    patient=REFERENCE,
    owner=REFERENCE,
)

GOAL = _resource(
    identifier=_arr(IDENTIFIER),
    lifecycleStatus=S,
    achievementStatus=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    priority=CODEABLE_CONCEPT,
    description=CODEABLE_CONCEPT,
    subject=REFERENCE,
    startDate=S,
    target=_arr(
        _struct(
            measure=CODEABLE_CONCEPT,
            detailQuantity=QUANTITY,
            dueDate=S,
        )
    ),
    statusDate=S,
    expressedBy=REFERENCE,
    addresses=_arr(REFERENCE),
    note=_arr(ANNOTATION),
)

MEDICATION = _resource(
    identifier=_arr(IDENTIFIER),
    code=CODEABLE_CONCEPT,
    status=S,
    manufacturer=REFERENCE,
    form=CODEABLE_CONCEPT,
    amount=_struct(numerator=QUANTITY, denominator=QUANTITY),
    ingredient=_arr(
        _struct(
            itemCodeableConcept=CODEABLE_CONCEPT,
            itemReference=REFERENCE,
            isActive=B,
        )
    ),
    batch=_struct(lotNumber=S, expirationDate=S),
)

IMAGING_STUDY = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    subject=REFERENCE,
    encounter=REFERENCE,
    started=S,
    numberOfSeries=I,
    numberOfInstances=I,
    procedureCode=_arr(CODEABLE_CONCEPT),
    location=REFERENCE,
    series=_arr(
        _struct(
            uid=S,
            number=I,
            modality=CODING,
            description=S,
            numberOfInstances=I,
            bodySite=CODING,
            started=S,
            instance=_arr(_struct(uid=S, sopClass=CODING, number=I, title=S)),
        )
    ),
)

SUPPLY_DELIVERY = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    patient=REFERENCE,
    type=CODEABLE_CONCEPT,
    suppliedItem=_struct(quantity=QUANTITY, itemCodeableConcept=CODEABLE_CONCEPT),
    occurrenceDateTime=S,
    supplier=REFERENCE,
    destination=REFERENCE,
)

EXPLANATION_OF_BENEFIT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=CODEABLE_CONCEPT,
    use=S,
    patient=REFERENCE,
    billablePeriod=PERIOD,
    created=S,
    insurer=REFERENCE,
    provider=REFERENCE,
    referral=REFERENCE,
    facility=REFERENCE,
    claim=REFERENCE,
    outcome=S,
    careTeam=_arr(
        _struct(sequence=I, provider=REFERENCE, role=CODEABLE_CONCEPT)
    ),
    insurance=_arr(_struct(focal=B, coverage=REFERENCE)),
    diagnosis=_arr(
        _struct(
            sequence=I,
            diagnosisCodeableConcept=CODEABLE_CONCEPT,
            diagnosisReference=REFERENCE,
            type=_arr(CODEABLE_CONCEPT),
        )
    ),
    item=_arr(
        _struct(
            sequence=I,
            category=CODEABLE_CONCEPT,
            productOrService=CODEABLE_CONCEPT,
            servicedPeriod=PERIOD,
            locationCodeableConcept=CODEABLE_CONCEPT,
            encounter=_arr(REFERENCE),
            unitPrice=MONEY,
            net=MONEY,
            adjudication=_arr(
                _struct(category=CODEABLE_CONCEPT, amount=MONEY)
            ),
        )
    ),
    total=_arr(_struct(category=CODEABLE_CONCEPT, amount=MONEY)),
    payment=_struct(amount=MONEY),
)

DOCUMENT_REFERENCE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    docStatus=S,
    type=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    subject=REFERENCE,
    date=S,
    author=_arr(REFERENCE),
    custodian=REFERENCE,
    content=_arr(_struct(attachment=ATTACHMENT, format=CODING)),
    context=_struct(
        encounter=_arr(REFERENCE), period=PERIOD, facilityType=CODEABLE_CONCEPT
    ),
)

PROVENANCE = _resource(
    target=_arr(REFERENCE),
    recorded=S,
    agent=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            role=_arr(CODEABLE_CONCEPT),
            who=REFERENCE,
            onBehalfOf=REFERENCE,
        )
    ),
)

# ---- round-5 widening: the next tier of common R4 exchange types ----------
# (hl7.org/fhir/R4 structure definitions; medication lifecycle, orders,
# scheduling, and the Media type the multimodal operators pair with)

MEDICATION_ADMINISTRATION = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    medicationCodeableConcept=CODEABLE_CONCEPT,
    medicationReference=REFERENCE,
    subject=REFERENCE,
    context=REFERENCE,
    effectiveDateTime=S,
    effectivePeriod=PERIOD,
    performer=_arr(_struct(function=CODEABLE_CONCEPT, actor=REFERENCE)),
    reasonCode=_arr(CODEABLE_CONCEPT),
    request=REFERENCE,
    dosage=_struct(
        text=S,
        route=CODEABLE_CONCEPT,
        dose=QUANTITY,
        rateQuantity=QUANTITY,
    ),
)

MEDICATION_DISPENSE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    medicationCodeableConcept=CODEABLE_CONCEPT,
    medicationReference=REFERENCE,
    subject=REFERENCE,
    context=REFERENCE,
    performer=_arr(_struct(function=CODEABLE_CONCEPT, actor=REFERENCE)),
    authorizingPrescription=_arr(REFERENCE),
    quantity=QUANTITY,
    daysSupply=QUANTITY,
    whenPrepared=S,
    whenHandedOver=S,
    dosageInstruction=_arr(
        _struct(text=S, route=CODEABLE_CONCEPT, doseQuantity=QUANTITY)
    ),
)

MEDICATION_STATEMENT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    medicationCodeableConcept=CODEABLE_CONCEPT,
    medicationReference=REFERENCE,
    subject=REFERENCE,
    context=REFERENCE,
    effectiveDateTime=S,
    effectivePeriod=PERIOD,
    dateAsserted=S,
    reasonCode=_arr(CODEABLE_CONCEPT),
)

SERVICE_REQUEST = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    intent=S,
    category=_arr(CODEABLE_CONCEPT),
    priority=S,
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    occurrenceDateTime=S,
    occurrencePeriod=PERIOD,
    requester=REFERENCE,
    performer=_arr(REFERENCE),
    reasonCode=_arr(CODEABLE_CONCEPT),
)

SPECIMEN = _resource(
    identifier=_arr(IDENTIFIER),
    accessionIdentifier=IDENTIFIER,
    status=S,
    type=CODEABLE_CONCEPT,
    subject=REFERENCE,
    receivedTime=S,
    # r15b: parent aliquot chain (hl7.org/fhir/R4/specimen.html) — the
    # OMOP fact_relationship source; monotone field add, absent in the
    # main corpora so existing Specimen consumers parse unchanged
    parent=_arr(REFERENCE),
    collection=_struct(
        collector=REFERENCE,
        collectedDateTime=S,
        quantity=QUANTITY,
        bodySite=CODEABLE_CONCEPT,
    ),
)

PRACTITIONER_ROLE = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    period=PERIOD,
    practitioner=REFERENCE,
    organization=REFERENCE,
    code=_arr(CODEABLE_CONCEPT),
    specialty=_arr(CODEABLE_CONCEPT),
    location=_arr(REFERENCE),
    telecom=_arr(CONTACT_POINT),
)

FAMILY_MEMBER_HISTORY = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    patient=REFERENCE,
    date=S,
    relationship=CODEABLE_CONCEPT,
    sex=CODEABLE_CONCEPT,
    bornDate=S,
    condition=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            onsetAge=QUANTITY,
            contributedToDeath=B,
        )
    ),
)

EPISODE_OF_CARE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=_arr(CODEABLE_CONCEPT),
    patient=REFERENCE,
    managingOrganization=REFERENCE,
    period=PERIOD,
    careManager=REFERENCE,
)

APPOINTMENT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    serviceCategory=_arr(CODEABLE_CONCEPT),
    serviceType=_arr(CODEABLE_CONCEPT),
    appointmentType=CODEABLE_CONCEPT,
    reasonCode=_arr(CODEABLE_CONCEPT),
    priority=I,
    description=S,
    start=S,
    end=S,
    participant=_arr(
        _struct(
            type=_arr(CODEABLE_CONCEPT),
            actor=REFERENCE,
            required=S,
            status=S,
        )
    ),
)

COMMUNICATION = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    category=_arr(CODEABLE_CONCEPT),
    priority=S,
    subject=REFERENCE,
    encounter=REFERENCE,
    sent=S,
    received=S,
    sender=REFERENCE,
    recipient=_arr(REFERENCE),
    payload=_arr(_struct(contentString=S)),
)

CONSENT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    scope=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    patient=REFERENCE,
    dateTime=S,
    performer=_arr(REFERENCE),
    organization=_arr(REFERENCE),
    policyRule=CODEABLE_CONCEPT,
)

MEDIA = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=CODEABLE_CONCEPT,
    modality=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    createdDateTime=S,
    operator=REFERENCE,
    content=ATTACHMENT,
    height=I,
    width=I,
    frames=I,
    duration=D,
)

# ---- round-10 promotions: the next tier of types real corpora hit -------
#
# Promoted from the full-catalog DomainResource spine to full element
# trees (r9 verdict "What's missing" item 2): payer claim adjudication
# (ClaimResponse), patient-reported data (QuestionnaireResponse),
# clinical documents / IPS (Composition), workflow (Task), and risk
# scoring (RiskAssessment). Element trees hand-derived from the public
# R4 spec (hl7.org/fhir/R4/<type>.html). Promotion is MONOTONE: each
# promoted type keeps every DomainResource spine field the spine schema
# declared (implicitRules/language/text/extension/modifierExtension) —
# a corpus that parsed under full=True must never lose fields when its
# type is later promoted. QuestionnaireResponse.item and
# Composition.section are RECURSIVE in the spec; Spark StructTypes
# cannot recurse, so the tree is depth-limited to two nested levels —
# the same wholesale-override escape hatch applies when a corpus nests
# deeper (`01_dbignite_sample.py:123-146`).

NARRATIVE = _struct(status=S, div=S)

_ADJUDICATION = _struct(
    category=CODEABLE_CONCEPT,
    reason=CODEABLE_CONCEPT,
    amount=MONEY,
    value=D,
)

CLAIM_RESPONSE = _resource(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
    identifier=_arr(IDENTIFIER),
    status=S,
    type=CODEABLE_CONCEPT,
    subType=CODEABLE_CONCEPT,
    use=S,
    patient=REFERENCE,
    created=S,
    insurer=REFERENCE,
    requestor=REFERENCE,
    request=REFERENCE,
    outcome=S,
    disposition=S,
    preAuthRef=S,
    payeeType=CODEABLE_CONCEPT,
    item=_arr(
        _struct(
            itemSequence=I,
            noteNumber=_arr(I),
            adjudication=_arr(_ADJUDICATION),
        )
    ),
    total=_arr(_struct(category=CODEABLE_CONCEPT, amount=MONEY)),
    payment=_struct(
        type=CODEABLE_CONCEPT,
        adjustment=MONEY,
        adjustmentReason=CODEABLE_CONCEPT,
        date=S,
        amount=MONEY,
        identifier=IDENTIFIER,
    ),
    fundsReserve=CODEABLE_CONCEPT,
    formCode=CODEABLE_CONCEPT,
    processNote=_arr(
        _struct(number=I, type=S, text=S, language=CODEABLE_CONCEPT)
    ),
    communicationRequest=_arr(REFERENCE),
    insurance=_arr(
        _struct(
            sequence=I,
            focal=B,
            coverage=REFERENCE,
            businessArrangement=S,
            claimResponse=REFERENCE,
        )
    ),
    error=_arr(
        _struct(
            itemSequence=I,
            detailSequence=I,
            subDetailSequence=I,
            code=CODEABLE_CONCEPT,
        )
    ),
)

# answer value[x] choice elements among the types a tabular source maps
_QR_ANSWER_VALUES = dict(
    valueBoolean=B,
    valueDecimal=D,
    valueInteger=I,
    valueDate=S,
    valueDateTime=S,
    valueTime=S,
    valueString=S,
    valueUri=S,
    valueQuantity=QUANTITY,
    valueCoding=CODING,
    valueReference=REFERENCE,
)

_QR_ITEM_LEAF = _struct(
    linkId=S,
    definition=S,
    text=S,
    answer=_arr(_struct(**_QR_ANSWER_VALUES)),
)

QUESTIONNAIRE_RESPONSE = _resource(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
    identifier=IDENTIFIER,  # 0..1 here, unlike most resources
    basedOn=_arr(REFERENCE),
    partOf=_arr(REFERENCE),
    questionnaire=S,
    status=S,
    subject=REFERENCE,
    encounter=REFERENCE,
    authored=S,
    author=REFERENCE,
    source=REFERENCE,
    item=_arr(
        _struct(
            linkId=S,
            definition=S,
            text=S,
            answer=_arr(_struct(**_QR_ANSWER_VALUES, item=_arr(_QR_ITEM_LEAF))),
            item=_arr(_QR_ITEM_LEAF),
        )
    ),
)

_SECTION_LEAF = _struct(
    title=S,
    code=CODEABLE_CONCEPT,
    author=_arr(REFERENCE),
    focus=REFERENCE,
    text=NARRATIVE,
    mode=S,
    orderedBy=CODEABLE_CONCEPT,
    entry=_arr(REFERENCE),
    emptyReason=CODEABLE_CONCEPT,
)

COMPOSITION = _resource(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
    identifier=IDENTIFIER,  # 0..1
    status=S,
    type=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    subject=REFERENCE,
    encounter=REFERENCE,
    date=S,
    author=_arr(REFERENCE),
    title=S,
    confidentiality=S,
    attester=_arr(_struct(mode=S, time=S, party=REFERENCE)),
    custodian=REFERENCE,
    relatesTo=_arr(
        _struct(code=S, targetIdentifier=IDENTIFIER, targetReference=REFERENCE)
    ),
    event=_arr(
        _struct(
            code=_arr(CODEABLE_CONCEPT), period=PERIOD, detail=_arr(REFERENCE)
        )
    ),
    section=_arr(
        _struct(
            title=S,
            code=CODEABLE_CONCEPT,
            author=_arr(REFERENCE),
            focus=REFERENCE,
            text=NARRATIVE,
            mode=S,
            orderedBy=CODEABLE_CONCEPT,
            entry=_arr(REFERENCE),
            emptyReason=CODEABLE_CONCEPT,
            section=_arr(_SECTION_LEAF),
        )
    ),
)

# Task.input/output value[x] spans every FHIR type; declare the choice
# elements a tabular mapping realistically carries
_TASK_VALUES = dict(
    type=CODEABLE_CONCEPT,
    valueBoolean=B,
    valueDecimal=D,
    valueInteger=I,
    valueString=S,
    valueDate=S,
    valueDateTime=S,
    valueCode=S,
    valueUri=S,
    valueQuantity=QUANTITY,
    valueCodeableConcept=CODEABLE_CONCEPT,
    valueReference=REFERENCE,
)

TASK = _resource(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
    identifier=_arr(IDENTIFIER),
    instantiatesCanonical=S,
    instantiatesUri=S,
    basedOn=_arr(REFERENCE),
    groupIdentifier=IDENTIFIER,
    partOf=_arr(REFERENCE),
    status=S,
    statusReason=CODEABLE_CONCEPT,
    businessStatus=CODEABLE_CONCEPT,
    intent=S,
    priority=S,
    code=CODEABLE_CONCEPT,
    description=S,
    focus=REFERENCE,
    # `for` is a reserved word in many languages but a legal Spark/JSON
    # field name; keyword-arg syntax can't express it, hence the dict
    **{"for": REFERENCE},
    encounter=REFERENCE,
    executionPeriod=PERIOD,
    authoredOn=S,
    lastModified=S,
    requester=REFERENCE,
    performerType=_arr(CODEABLE_CONCEPT),
    owner=REFERENCE,
    location=REFERENCE,
    reasonCode=CODEABLE_CONCEPT,
    reasonReference=REFERENCE,
    note=_arr(ANNOTATION),
    restriction=_struct(
        repetitions=I, period=PERIOD, recipient=_arr(REFERENCE)
    ),
    input=_arr(_struct(**_TASK_VALUES)),
    output=_arr(_struct(**_TASK_VALUES)),
)

RISK_ASSESSMENT = _resource(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
    identifier=_arr(IDENTIFIER),
    basedOn=REFERENCE,
    parent=REFERENCE,
    status=S,
    method=CODEABLE_CONCEPT,
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    occurrenceDateTime=S,
    occurrencePeriod=PERIOD,
    condition=REFERENCE,
    performer=REFERENCE,
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    basis=_arr(REFERENCE),
    prediction=_arr(
        _struct(
            outcome=CODEABLE_CONCEPT,
            probabilityDecimal=D,
            qualitativeRisk=CODEABLE_CONCEPT,
            relativeRisk=D,
            whenPeriod=PERIOD,
            whenRange=_struct(low=QUANTITY, high=QUANTITY),
            rationale=S,
        )
    ),
    mitigation=S,
    note=_arr(ANNOTATION),
)

# Round-10 second batch: the scheduling trio (Schedule/Slot/
# AppointmentResponse — operational FHIR complementing curated
# Appointment) plus cohort types (Group, List). Same monotone-promotion
# contract: spine fields retained.

_SPINE_FIELDS = dict(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
)

SCHEDULE = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    active=B,
    serviceCategory=_arr(CODEABLE_CONCEPT),
    serviceType=_arr(CODEABLE_CONCEPT),
    specialty=_arr(CODEABLE_CONCEPT),
    actor=_arr(REFERENCE),
    planningHorizon=PERIOD,
    comment=S,
)

SLOT = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    serviceCategory=_arr(CODEABLE_CONCEPT),
    serviceType=_arr(CODEABLE_CONCEPT),
    specialty=_arr(CODEABLE_CONCEPT),
    appointmentType=CODEABLE_CONCEPT,
    schedule=REFERENCE,
    status=S,
    start=S,
    end=S,
    overbooked=B,
    comment=S,
)

APPOINTMENT_RESPONSE = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    appointment=REFERENCE,
    start=S,
    end=S,
    participantType=_arr(CODEABLE_CONCEPT),
    actor=REFERENCE,
    participantStatus=S,
    comment=S,
)

GROUP = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    active=B,
    type=S,
    actual=B,
    code=CODEABLE_CONCEPT,
    name=S,
    quantity=I,
    managingEntity=REFERENCE,
    characteristic=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            valueCodeableConcept=CODEABLE_CONCEPT,
            valueBoolean=B,
            valueQuantity=QUANTITY,
            valueReference=REFERENCE,
            exclude=B,
            period=PERIOD,
        )
    ),
    member=_arr(_struct(entity=REFERENCE, period=PERIOD, inactive=B)),
)

# Round-11 third batch: clinical workflow/alerting (Flag, DetectedIssue,
# ClinicalImpression) and the remaining request types common in EHR
# exchange (DeviceRequest, CommunicationRequest) — the types most often
# present in care-coordination feeds that were still on the spine.
# Element trees hand-derived from the public R4 spec
# (hl7.org/fhir/R4/<type>.html); same monotone-promotion contract.

FLAG = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    status=S,
    category=_arr(CODEABLE_CONCEPT),
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    period=PERIOD,
    encounter=REFERENCE,
    author=REFERENCE,
)

DETECTED_ISSUE = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    status=S,
    code=CODEABLE_CONCEPT,
    severity=S,
    patient=REFERENCE,
    identifiedDateTime=S,
    identifiedPeriod=PERIOD,
    author=REFERENCE,
    implicated=_arr(REFERENCE),
    evidence=_arr(
        _struct(code=_arr(CODEABLE_CONCEPT), detail=_arr(REFERENCE))
    ),
    detail=S,
    reference=S,
    mitigation=_arr(
        _struct(action=CODEABLE_CONCEPT, date=S, author=REFERENCE)
    ),
)

CLINICAL_IMPRESSION = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    status=S,
    statusReason=CODEABLE_CONCEPT,
    code=CODEABLE_CONCEPT,
    description=S,
    subject=REFERENCE,
    encounter=REFERENCE,
    effectiveDateTime=S,
    effectivePeriod=PERIOD,
    date=S,
    assessor=REFERENCE,
    previous=REFERENCE,
    problem=_arr(REFERENCE),
    investigation=_arr(
        _struct(code=CODEABLE_CONCEPT, item=_arr(REFERENCE))
    ),
    protocol=_arr(S),
    summary=S,
    finding=_arr(
        _struct(
            itemCodeableConcept=CODEABLE_CONCEPT,
            itemReference=REFERENCE,
            basis=S,
        )
    ),
    prognosisCodeableConcept=_arr(CODEABLE_CONCEPT),
    prognosisReference=_arr(REFERENCE),
    supportingInfo=_arr(REFERENCE),
    note=_arr(ANNOTATION),
)

DEVICE_REQUEST = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    instantiatesCanonical=_arr(S),
    instantiatesUri=_arr(S),
    basedOn=_arr(REFERENCE),
    priorRequest=_arr(REFERENCE),
    groupIdentifier=IDENTIFIER,
    status=S,
    intent=S,
    priority=S,
    codeReference=REFERENCE,
    codeCodeableConcept=CODEABLE_CONCEPT,
    parameter=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            valueCodeableConcept=CODEABLE_CONCEPT,
            valueQuantity=QUANTITY,
            valueBoolean=B,
        )
    ),
    subject=REFERENCE,
    encounter=REFERENCE,
    occurrenceDateTime=S,
    occurrencePeriod=PERIOD,
    authoredOn=S,
    requester=REFERENCE,
    performerType=CODEABLE_CONCEPT,
    performer=REFERENCE,
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    insurance=_arr(REFERENCE),
    supportingInfo=_arr(REFERENCE),
    note=_arr(ANNOTATION),
    relevantHistory=_arr(REFERENCE),
)

COMMUNICATION_REQUEST = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    basedOn=_arr(REFERENCE),
    replaces=_arr(REFERENCE),
    groupIdentifier=IDENTIFIER,
    status=S,
    statusReason=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    priority=S,
    doNotPerform=B,
    medium=_arr(CODEABLE_CONCEPT),
    subject=REFERENCE,
    about=_arr(REFERENCE),
    encounter=REFERENCE,
    payload=_arr(
        _struct(
            contentString=S,
            contentAttachment=ATTACHMENT,
            contentReference=REFERENCE,
        )
    ),
    occurrenceDateTime=S,
    occurrencePeriod=PERIOD,
    authoredOn=S,
    requester=REFERENCE,
    recipient=_arr(REFERENCE),
    sender=REFERENCE,
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    note=_arr(ANNOTATION),
)

LIST_RESOURCE = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    status=S,
    mode=S,
    title=S,
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    date=S,
    source=REFERENCE,
    orderedBy=CODEABLE_CONCEPT,
    note=_arr(ANNOTATION),
    entry=_arr(
        _struct(flag=CODEABLE_CONCEPT, deleted=B, date=S, item=REFERENCE)
    ),
    emptyReason=CODEABLE_CONCEPT,
)


# ---- round-11 continuation: fourth promotion batch (clinical ops) ---------
# AdverseEvent / AuditEvent / Person / Questionnaire / DeviceUseStatement —
# the safety-reporting, access-audit, MPI, and form-definition types a
# hospital operations export carries (public R4 definitions, hl7.org/fhir/
# R4/<type>.html). Questionnaire.item is recursive in the spec; the
# catalog bounds it one level (the QuestionnaireResponse pattern).

ADVERSE_EVENT = _resource(
    **_SPINE_FIELDS,
    identifier=IDENTIFIER,  # 0..1 in R4, like QuestionnaireResponse
    actuality=S,
    category=_arr(CODEABLE_CONCEPT),
    event=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    date=S,
    detected=S,
    recordedDate=S,
    resultingCondition=_arr(REFERENCE),
    location=REFERENCE,
    seriousness=CODEABLE_CONCEPT,
    severity=CODEABLE_CONCEPT,
    outcome=CODEABLE_CONCEPT,
    recorder=REFERENCE,
    contributor=_arr(REFERENCE),
    suspectEntity=_arr(
        _struct(
            instance=REFERENCE,
            causality=_arr(
                _struct(
                    assessment=CODEABLE_CONCEPT,
                    productRelatedness=S,
                    author=REFERENCE,
                    method=CODEABLE_CONCEPT,
                )
            ),
        )
    ),
    subjectMedicalHistory=_arr(REFERENCE),
    referenceDocument=_arr(REFERENCE),
    study=_arr(REFERENCE),
)

AUDIT_EVENT = _resource(
    **_SPINE_FIELDS,
    type=CODING,
    subtype=_arr(CODING),
    action=S,
    period=PERIOD,
    recorded=S,
    outcome=S,
    outcomeDesc=S,
    purposeOfEvent=_arr(CODEABLE_CONCEPT),
    agent=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            role=_arr(CODEABLE_CONCEPT),
            who=REFERENCE,
            altId=S,
            name=S,
            requestor=B,
            location=REFERENCE,
            policy=_arr(S),
            media=CODING,
            network=_struct(address=S, type=S),
            purposeOfUse=_arr(CODEABLE_CONCEPT),
        )
    ),
    source=_struct(site=S, observer=REFERENCE, type=_arr(CODING)),
    entity=_arr(
        _struct(
            what=REFERENCE,
            type=CODING,
            role=CODING,
            lifecycle=CODING,
            securityLabel=_arr(CODING),
            name=S,
            description=S,
            query=S,
            detail=_arr(
                _struct(type=S, valueString=S, valueBase64Binary=S)
            ),
        )
    ),
)

PERSON = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    name=_arr(HUMAN_NAME),
    telecom=_arr(CONTACT_POINT),
    gender=S,
    birthDate=S,
    address=_arr(ADDRESS),
    photo=ATTACHMENT,
    managingOrganization=REFERENCE,
    active=B,
    link=_arr(_struct(target=REFERENCE, assurance=S)),
)

_Q_ANSWER_OPTION = _struct(
    valueInteger=I,
    valueDate=S,
    valueTime=S,
    valueString=S,
    valueCoding=CODING,
    initialSelected=B,
)

_Q_ITEM_LEAF = _struct(
    linkId=S,
    definition=S,
    code=_arr(CODING),
    prefix=S,
    text=S,
    type=S,
    required=B,
    repeats=B,
    readOnly=B,
    maxLength=I,
    answerValueSet=S,
    answerOption=_arr(_Q_ANSWER_OPTION),
)

QUESTIONNAIRE = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    derivedFrom=_arr(S),
    status=S,
    experimental=B,
    subjectType=_arr(S),
    date=S,
    publisher=S,
    description=S,
    purpose=S,
    approvalDate=S,
    lastReviewDate=S,
    effectivePeriod=PERIOD,
    code=_arr(CODING),
    item=_arr(
        _struct(
            linkId=S,
            definition=S,
            code=_arr(CODING),
            prefix=S,
            text=S,
            type=S,
            enableBehavior=S,
            required=B,
            repeats=B,
            readOnly=B,
            maxLength=I,
            answerValueSet=S,
            answerOption=_arr(_Q_ANSWER_OPTION),
            initial=_arr(
                _struct(
                    valueBoolean=B,
                    valueInteger=I,
                    valueString=S,
                    valueCoding=CODING,
                )
            ),
            item=_arr(_Q_ITEM_LEAF),
        )
    ),
)

DEVICE_USE_STATEMENT = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    basedOn=_arr(REFERENCE),
    status=S,
    subject=REFERENCE,
    derivedFrom=_arr(REFERENCE),
    timingPeriod=PERIOD,
    timingDateTime=S,
    recordedOn=S,
    source=REFERENCE,
    device=REFERENCE,
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    bodySite=CODEABLE_CONCEPT,
    note=_arr(ANNOTATION),
)


# Round-12 fifth batch: nutrition/supply ordering (NutritionOrder —
# previously the corpus's spine-only exerciser, a role Basic now plays —
# and SupplyRequest, the request twin of curated SupplyDelivery),
# quality reporting (MeasureReport — eCQM output, the highest-volume
# population-health artifact), immunization registry forecasts
# (ImmunizationRecommendation, companion to curated Immunization), and
# the provider-directory pair (HealthcareService, Endpoint). Same
# monotone-promotion contract: spine fields retained.

NUTRITION_ORDER = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    intent=S,
    patient=REFERENCE,
    encounter=REFERENCE,
    dateTime=S,
    orderer=REFERENCE,
    allergyIntolerance=_arr(REFERENCE),
    foodPreferenceModifier=_arr(CODEABLE_CONCEPT),
    excludeFoodModifier=_arr(CODEABLE_CONCEPT),
    oralDiet=_struct(
        type=_arr(CODEABLE_CONCEPT),
        nutrient=_arr(_struct(modifier=CODEABLE_CONCEPT, amount=QUANTITY)),
        texture=_arr(
            _struct(modifier=CODEABLE_CONCEPT, foodType=CODEABLE_CONCEPT)
        ),
        fluidConsistencyType=_arr(CODEABLE_CONCEPT),
        instruction=S,
    ),
    supplement=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            productName=S,
            quantity=QUANTITY,
            instruction=S,
        )
    ),
    enteralFormula=_struct(
        baseFormulaType=CODEABLE_CONCEPT,
        baseFormulaProductName=S,
        additiveType=CODEABLE_CONCEPT,
        caloricDensity=QUANTITY,
        routeofAdministration=CODEABLE_CONCEPT,
        maxVolumeToDeliver=QUANTITY,
        administrationInstruction=S,
    ),
    note=_arr(ANNOTATION),
)

SUPPLY_REQUEST = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    category=CODEABLE_CONCEPT,
    priority=S,
    itemCodeableConcept=CODEABLE_CONCEPT,
    itemReference=REFERENCE,
    quantity=QUANTITY,
    occurrenceDateTime=S,
    occurrencePeriod=PERIOD,
    authoredOn=S,
    requester=REFERENCE,
    supplier=_arr(REFERENCE),
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    deliverFrom=REFERENCE,
    deliverTo=REFERENCE,
)

MEASURE_REPORT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=S,
    measure=S,
    subject=REFERENCE,
    date=S,
    reporter=REFERENCE,
    period=PERIOD,
    improvementNotation=CODEABLE_CONCEPT,
    group=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            population=_arr(_struct(code=CODEABLE_CONCEPT, count=I)),
            measureScore=QUANTITY,
        )
    ),
    evaluatedResource=_arr(REFERENCE),
)

IMMUNIZATION_RECOMMENDATION = _resource(
    identifier=_arr(IDENTIFIER),
    patient=REFERENCE,
    date=S,
    authority=REFERENCE,
    recommendation=_arr(
        _struct(
            vaccineCode=_arr(CODEABLE_CONCEPT),
            targetDisease=CODEABLE_CONCEPT,
            contraindicatedVaccineCode=_arr(CODEABLE_CONCEPT),
            forecastStatus=CODEABLE_CONCEPT,
            forecastReason=_arr(CODEABLE_CONCEPT),
            dateCriterion=_arr(_struct(code=CODEABLE_CONCEPT, value=S)),
            description=S,
            series=S,
            doseNumberPositiveInt=I,
            seriesDosesPositiveInt=I,
            supportingImmunization=_arr(REFERENCE),
        )
    ),
)

HEALTHCARE_SERVICE = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    providedBy=REFERENCE,
    category=_arr(CODEABLE_CONCEPT),
    type=_arr(CODEABLE_CONCEPT),
    specialty=_arr(CODEABLE_CONCEPT),
    location=_arr(REFERENCE),
    name=S,
    comment=S,
    telecom=_arr(CONTACT_POINT),
    coverageArea=_arr(REFERENCE),
    serviceProvisionCode=_arr(CODEABLE_CONCEPT),
    program=_arr(CODEABLE_CONCEPT),
    communication=_arr(CODEABLE_CONCEPT),
    referralMethod=_arr(CODEABLE_CONCEPT),
    appointmentRequired=B,
    availableTime=_arr(
        _struct(
            daysOfWeek=_arr(S),
            allDay=B,
            availableStartTime=S,
            availableEndTime=S,
        )
    ),
    notAvailable=_arr(_struct(description=S, during=PERIOD)),
    availabilityExceptions=S,
    endpoint=_arr(REFERENCE),
)

ENDPOINT = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    connectionType=CODING,
    name=S,
    managingOrganization=REFERENCE,
    contact=_arr(CONTACT_POINT),
    period=PERIOD,
    payloadType=_arr(CODEABLE_CONCEPT),
    payloadMimeType=_arr(S),
    address=S,
    header=_arr(S),
)

# Round-12 sixth batch: the payer/financial transaction cycle —
# eligibility (CoverageEligibilityRequest/Response, the FHIR analog of
# X12 270/271, the highest-volume payer exchange), charging/billing
# (ChargeItem → Invoice), payment notification (PaymentNotice) — which
# completes the financial chain around the already-curated
# Claim/ClaimResponse/Coverage/ExplanationOfBenefit/Account — plus
# OperationOutcome, the error/warning resource every FHIR REST
# response and bulk-$export error file carries. Same monotone-promotion
# contract: spine fields retained.

COVERAGE_ELIGIBILITY_REQUEST = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    priority=CODEABLE_CONCEPT,
    purpose=_arr(S),
    patient=REFERENCE,
    servicedDate=S,
    servicedPeriod=PERIOD,
    created=S,
    enterer=REFERENCE,
    provider=REFERENCE,
    insurer=REFERENCE,
    facility=REFERENCE,
    supportingInfo=_arr(
        _struct(sequence=I, information=REFERENCE, appliesToAll=B)
    ),
    insurance=_arr(
        _struct(focal=B, coverage=REFERENCE, businessArrangement=S)
    ),
    item=_arr(
        _struct(
            supportingInfoSequence=_arr(I),
            category=CODEABLE_CONCEPT,
            productOrService=CODEABLE_CONCEPT,
            modifier=_arr(CODEABLE_CONCEPT),
            provider=REFERENCE,
            quantity=QUANTITY,
            unitPrice=MONEY,
            facility=REFERENCE,
            diagnosis=_arr(
                _struct(
                    diagnosisCodeableConcept=CODEABLE_CONCEPT,
                    diagnosisReference=REFERENCE,
                )
            ),
            detail=_arr(REFERENCE),
        )
    ),
)

COVERAGE_ELIGIBILITY_RESPONSE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    purpose=_arr(S),
    patient=REFERENCE,
    servicedDate=S,
    servicedPeriod=PERIOD,
    created=S,
    requestor=REFERENCE,
    request=REFERENCE,
    outcome=S,
    disposition=S,
    insurer=REFERENCE,
    insurance=_arr(
        _struct(
            coverage=REFERENCE,
            inforce=B,
            benefitPeriod=PERIOD,
            item=_arr(
                _struct(
                    category=CODEABLE_CONCEPT,
                    productOrService=CODEABLE_CONCEPT,
                    modifier=_arr(CODEABLE_CONCEPT),
                    provider=REFERENCE,
                    excluded=B,
                    name=S,
                    description=S,
                    network=CODEABLE_CONCEPT,
                    unit=CODEABLE_CONCEPT,
                    term=CODEABLE_CONCEPT,
                    benefit=_arr(
                        _struct(
                            type=CODEABLE_CONCEPT,
                            allowedUnsignedInt=I,
                            allowedString=S,
                            allowedMoney=MONEY,
                            usedUnsignedInt=I,
                            usedString=S,
                            usedMoney=MONEY,
                        )
                    ),
                    authorizationRequired=B,
                    authorizationSupporting=_arr(CODEABLE_CONCEPT),
                    authorizationUrl=S,
                )
            ),
        )
    ),
    preAuthRef=S,
    form=CODEABLE_CONCEPT,
    error=_arr(_struct(code=CODEABLE_CONCEPT)),
)

CHARGE_ITEM = _resource(
    identifier=_arr(IDENTIFIER),
    definitionUri=_arr(S),
    definitionCanonical=_arr(S),
    status=S,
    partOf=_arr(REFERENCE),
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    context=REFERENCE,
    occurrenceDateTime=S,
    occurrencePeriod=PERIOD,
    performer=_arr(_struct(function=CODEABLE_CONCEPT, actor=REFERENCE)),
    performingOrganization=REFERENCE,
    requestingOrganization=REFERENCE,
    costCenter=REFERENCE,
    quantity=QUANTITY,
    bodysite=_arr(CODEABLE_CONCEPT),
    factorOverride=D,
    priceOverride=MONEY,
    overrideReason=S,
    enterer=REFERENCE,
    enteredDate=S,
    reason=_arr(CODEABLE_CONCEPT),
    service=_arr(REFERENCE),
    productReference=REFERENCE,
    productCodeableConcept=CODEABLE_CONCEPT,
    account=_arr(REFERENCE),
    note=_arr(ANNOTATION),
    supportingInformation=_arr(REFERENCE),
)

_PRICE_COMPONENT = _struct(
    type=S, code=CODEABLE_CONCEPT, factor=D, amount=MONEY
)

INVOICE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    cancelledReason=S,
    type=CODEABLE_CONCEPT,
    subject=REFERENCE,
    recipient=REFERENCE,
    date=S,
    participant=_arr(_struct(role=CODEABLE_CONCEPT, actor=REFERENCE)),
    issuer=REFERENCE,
    account=REFERENCE,
    lineItem=_arr(
        _struct(
            sequence=I,
            chargeItemReference=REFERENCE,
            chargeItemCodeableConcept=CODEABLE_CONCEPT,
            priceComponent=_arr(_PRICE_COMPONENT),
        )
    ),
    totalPriceComponent=_arr(_PRICE_COMPONENT),
    totalNet=MONEY,
    totalGross=MONEY,
    paymentTerms=S,
    note=_arr(ANNOTATION),
)

PAYMENT_NOTICE = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    request=REFERENCE,
    response=REFERENCE,
    created=S,
    provider=REFERENCE,
    payment=REFERENCE,
    paymentDate=S,
    payee=REFERENCE,
    recipient=REFERENCE,
    amount=MONEY,
    paymentStatus=CODEABLE_CONCEPT,
)

# ---- round-12 seventh promotion batch: payer/provider directory ----------
# (hl7.org/fhir/R4/insuranceplan.html, organizationaffiliation.html,
# paymentreconciliation.html — the plan-catalog / network-directory /
# remittance trio that completes the batch-6 financial cycle)

INSURANCE_PLAN = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    type=_arr(CODEABLE_CONCEPT),
    name=S,
    alias=_arr(S),
    period=PERIOD,
    ownedBy=REFERENCE,
    administeredBy=REFERENCE,
    coverageArea=_arr(REFERENCE),
    contact=_arr(
        _struct(
            purpose=CODEABLE_CONCEPT,
            name=HUMAN_NAME,
            telecom=_arr(CONTACT_POINT),
            address=ADDRESS,
        )
    ),
    network=_arr(REFERENCE),
    coverage=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            network=_arr(REFERENCE),
            benefit=_arr(
                _struct(
                    type=CODEABLE_CONCEPT,
                    requirement=S,
                    limit=_arr(
                        _struct(value=QUANTITY, code=CODEABLE_CONCEPT)
                    ),
                )
            ),
        )
    ),
    plan=_arr(
        _struct(
            identifier=_arr(IDENTIFIER),
            type=CODEABLE_CONCEPT,
            coverageArea=_arr(REFERENCE),
            network=_arr(REFERENCE),
            generalCost=_arr(
                _struct(
                    type=CODEABLE_CONCEPT,
                    groupSize=I,
                    cost=MONEY,
                    comment=S,
                )
            ),
            specificCost=_arr(
                _struct(
                    category=CODEABLE_CONCEPT,
                    benefit=_arr(
                        _struct(
                            type=CODEABLE_CONCEPT,
                            cost=_arr(
                                _struct(
                                    type=CODEABLE_CONCEPT,
                                    applicability=CODEABLE_CONCEPT,
                                    qualifiers=_arr(CODEABLE_CONCEPT),
                                    value=QUANTITY,
                                )
                            ),
                        )
                    ),
                )
            ),
        )
    ),
)

ORGANIZATION_AFFILIATION = _resource(
    identifier=_arr(IDENTIFIER),
    active=B,
    period=PERIOD,
    organization=REFERENCE,
    participatingOrganization=REFERENCE,
    network=_arr(REFERENCE),
    code=_arr(CODEABLE_CONCEPT),
    specialty=_arr(CODEABLE_CONCEPT),
    location=_arr(REFERENCE),
    healthcareService=_arr(REFERENCE),
    telecom=_arr(CONTACT_POINT),
    endpoint=_arr(REFERENCE),
)

PAYMENT_RECONCILIATION = _resource(
    identifier=_arr(IDENTIFIER),
    status=S,
    period=PERIOD,
    created=S,
    paymentIssuer=REFERENCE,
    request=REFERENCE,
    requestor=REFERENCE,
    outcome=S,
    disposition=S,
    paymentDate=S,
    paymentAmount=MONEY,
    paymentIdentifier=IDENTIFIER,
    detail=_arr(
        _struct(
            identifier=IDENTIFIER,
            predecessor=IDENTIFIER,
            type=CODEABLE_CONCEPT,
            request=REFERENCE,
            submitter=REFERENCE,
            response=REFERENCE,
            date=S,
            responsible=REFERENCE,
            payee=REFERENCE,
            amount=MONEY,
        )
    ),
    formCode=CODEABLE_CONCEPT,
    processNote=_arr(_struct(type=S, text=S)),
)

OPERATION_OUTCOME = _resource(
    issue=_arr(
        _struct(
            severity=S,
            code=S,
            details=CODEABLE_CONCEPT,
            diagnostics=S,
            location=_arr(S),
            expression=_arr(S),
        )
    ),
)

# Round-12 EIGHTH batch (device-domain chain, hl7.org/fhir/R4):
# DeviceDefinition (the catalog entry a Device instantiates),
# DeviceMetric (the telemetry channel a monitor exposes — what a
# device-integration feed ships at volume, and the OMOP
# device-exposure companion dimension), and Substance (the
# material/ingredient dimension AllergyIntolerance and Medication
# reference) — rounding out the already-curated Device /
# DeviceUseStatement pair. Monotone-promotion contract: spine fields
# retained.

DEVICE_DEFINITION = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    udiDeviceIdentifier=_arr(
        _struct(deviceIdentifier=S, issuer=S, jurisdiction=S)
    ),
    manufacturerString=S,
    manufacturerReference=REFERENCE,
    deviceName=_arr(_struct(name=S, type=S)),
    modelNumber=S,
    type=CODEABLE_CONCEPT,
    specialization=_arr(_struct(systemType=S, version=S)),
    version=_arr(S),
    safety=_arr(CODEABLE_CONCEPT),
    capability=_arr(
        _struct(type=CODEABLE_CONCEPT, description=_arr(CODEABLE_CONCEPT))
    ),
    property=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            valueQuantity=_arr(QUANTITY),
            valueCode=_arr(CODEABLE_CONCEPT),
        )
    ),
    owner=REFERENCE,
    url=S,
    note=_arr(ANNOTATION),
    quantity=QUANTITY,
    parentDevice=REFERENCE,
    material=_arr(
        _struct(substance=CODEABLE_CONCEPT, alternate=B, allergenicIndicator=B)
    ),
)

DEVICE_METRIC = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    type=CODEABLE_CONCEPT,
    unit=CODEABLE_CONCEPT,
    source=REFERENCE,
    parent=REFERENCE,
    operationalStatus=S,
    color=S,
    category=S,
    calibration=_arr(_struct(type=S, state=S, time=S)),
)

SUBSTANCE = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    status=S,
    category=_arr(CODEABLE_CONCEPT),
    code=CODEABLE_CONCEPT,
    description=S,
    instance=_arr(
        _struct(identifier=IDENTIFIER, expiry=S, quantity=QUANTITY)
    ),
    ingredient=_arr(
        _struct(
            substanceCodeableConcept=CODEABLE_CONCEPT,
            substanceReference=REFERENCE,
        )
    ),
)


# Round-13 NINTH batch (terminology service trio, hl7.org/fhir/R4):
# CodeSystem / ValueSet / ConceptMap — the definitional resources a
# real FHIR→OMOP ETL loads before anything else (source-to-standard
# code translation is the first step of every CDM mapping; cohort
# definitions ship as ValueSets; code membership checks read
# CodeSystem). Concept hierarchies are recursive in the spec; Spark
# StructTypes cannot recurse, so child ``concept`` arrays are captured
# one level deep (code/display/definition) — deeper nesting lands in
# ``_other``-style overrides if a corpus ever needs it. Monotone
# promotion: spine fields retained.

_DESIGNATION = _struct(language=S, use=CODING, value=S)

CODE_SYSTEM = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    status=S,
    experimental=B,
    date=S,
    publisher=S,
    description=S,
    caseSensitive=B,
    valueSet=S,
    hierarchyMeaning=S,
    compositional=B,
    versionNeeded=B,
    content=S,
    supplements=S,
    count=I,
    filter=_arr(_struct(code=S, description=S, operator=_arr(S), value=S)),
    property=_arr(_struct(code=S, uri=S, description=S, type=S)),
    concept=_arr(
        _struct(
            code=S,
            display=S,
            definition=S,
            designation=_arr(_DESIGNATION),
            property=_arr(
                _struct(
                    code=S, valueCode=S, valueString=S, valueInteger=I,
                    valueBoolean=B,
                )
            ),
            concept=_arr(_struct(code=S, display=S, definition=S)),
        )
    ),
)

_VS_CONCEPT_SET = _struct(
    system=S,
    version=S,
    concept=_arr(
        _struct(code=S, display=S, designation=_arr(_DESIGNATION))
    ),
    filter=_arr(_struct(property=S, op=S, value=S)),
    valueSet=_arr(S),
)

VALUE_SET = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    status=S,
    experimental=B,
    date=S,
    publisher=S,
    description=S,
    immutable=B,
    purpose=S,
    compose=_struct(
        lockedDate=S,
        inactive=B,
        include=_arr(_VS_CONCEPT_SET),
        exclude=_arr(_VS_CONCEPT_SET),
    ),
    expansion=_struct(
        identifier=S,
        timestamp=S,
        total=I,
        offset=I,
        contains=_arr(
            _struct(
                system=S, abstract=B, inactive=B, version=S, code=S,
                display=S,
            )
        ),
    ),
)

_CM_DEPENDS_ON = _struct(property=S, system=S, value=S, display=S)

CONCEPT_MAP = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=IDENTIFIER,
    version=S,
    name=S,
    title=S,
    status=S,
    experimental=B,
    date=S,
    publisher=S,
    description=S,
    purpose=S,
    sourceUri=S,
    sourceCanonical=S,
    targetUri=S,
    targetCanonical=S,
    group=_arr(
        _struct(
            source=S,
            sourceVersion=S,
            target=S,
            targetVersion=S,
            element=_arr(
                _struct(
                    code=S,
                    display=S,
                    target=_arr(
                        _struct(
                            code=S,
                            display=S,
                            equivalence=S,
                            comment=S,
                            dependsOn=_arr(_CM_DEPENDS_ON),
                            product=_arr(_CM_DEPENDS_ON),
                        )
                    ),
                )
            ),
            unmapped=_struct(mode=S, code=S, display=S, url=S),
        )
    ),
)


# Round-14 TENTH batch (the quality-measure / eCQM trio, hl7.org/fhir/
# R4): Measure / Library / PlanDefinition — the definitional resources
# a quality-reporting shop loads next after terminology (CMS eCQMs ship
# as Measure+Library bundles; order sets and protocols as
# PlanDefinitions; the curated MeasureReport already carries the
# results side). Expression/DataRequirement are the shared metadata
# types; PlanDefinition.action is recursive in the spec, so child
# ``action`` arrays are captured one level deep (the ConceptMap
# precedent). Monotone promotion: spine fields retained.

_EXPRESSION = _struct(
    description=S, name=S, language=S, expression=S, reference=S
)

_DATA_REQUIREMENT = _struct(
    type=S,
    profile=_arr(S),
    subjectCodeableConcept=CODEABLE_CONCEPT,
    subjectReference=REFERENCE,
    mustSupport=_arr(S),
    codeFilter=_arr(
        _struct(path=S, searchParam=S, valueSet=S, code=_arr(CODING))
    ),
    dateFilter=_arr(
        _struct(path=S, searchParam=S, valueDateTime=S, valuePeriod=PERIOD)
    ),
    limit=I,
    sort=_arr(_struct(path=S, direction=S)),
)

MEASURE = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    subtitle=S,
    status=S,
    experimental=B,
    subjectCodeableConcept=CODEABLE_CONCEPT,
    date=S,
    publisher=S,
    description=S,
    purpose=S,
    usage=S,
    approvalDate=S,
    lastReviewDate=S,
    effectivePeriod=PERIOD,
    topic=_arr(CODEABLE_CONCEPT),
    library=_arr(S),
    disclaimer=S,
    scoring=CODEABLE_CONCEPT,
    compositeScoring=CODEABLE_CONCEPT,
    type=_arr(CODEABLE_CONCEPT),
    riskAdjustment=S,
    rateAggregation=S,
    rationale=S,
    clinicalRecommendationStatement=S,
    improvementNotation=CODEABLE_CONCEPT,
    definition=_arr(S),
    guidance=S,
    group=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            description=S,
            population=_arr(
                _struct(
                    code=CODEABLE_CONCEPT,
                    description=S,
                    criteria=_EXPRESSION,
                )
            ),
            stratifier=_arr(
                _struct(
                    code=CODEABLE_CONCEPT,
                    description=S,
                    criteria=_EXPRESSION,
                    component=_arr(
                        _struct(
                            code=CODEABLE_CONCEPT,
                            description=S,
                            criteria=_EXPRESSION,
                        )
                    ),
                )
            ),
        )
    ),
    supplementalData=_arr(
        _struct(
            code=CODEABLE_CONCEPT,
            usage=_arr(CODEABLE_CONCEPT),
            description=S,
            criteria=_EXPRESSION,
        )
    ),
)

LIBRARY = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    subtitle=S,
    status=S,
    experimental=B,
    type=CODEABLE_CONCEPT,
    subjectCodeableConcept=CODEABLE_CONCEPT,
    subjectReference=REFERENCE,
    date=S,
    publisher=S,
    description=S,
    purpose=S,
    usage=S,
    approvalDate=S,
    lastReviewDate=S,
    effectivePeriod=PERIOD,
    topic=_arr(CODEABLE_CONCEPT),
    parameter=_arr(
        _struct(
            name=S, use=S, min=I, max=S, documentation=S, type=S,
            profile=S,
        )
    ),
    dataRequirement=_arr(_DATA_REQUIREMENT),
    content=_arr(ATTACHMENT),
)

PLAN_DEFINITION = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    subtitle=S,
    type=CODEABLE_CONCEPT,
    status=S,
    experimental=B,
    subjectCodeableConcept=CODEABLE_CONCEPT,
    subjectReference=REFERENCE,
    date=S,
    publisher=S,
    description=S,
    purpose=S,
    usage=S,
    approvalDate=S,
    lastReviewDate=S,
    effectivePeriod=PERIOD,
    topic=_arr(CODEABLE_CONCEPT),
    library=_arr(S),
    goal=_arr(
        _struct(
            category=CODEABLE_CONCEPT,
            description=CODEABLE_CONCEPT,
            priority=CODEABLE_CONCEPT,
            start=CODEABLE_CONCEPT,
            addresses=_arr(CODEABLE_CONCEPT),
            target=_arr(
                _struct(
                    measure=CODEABLE_CONCEPT,
                    detailQuantity=QUANTITY,
                    detailRange=_struct(low=QUANTITY, high=QUANTITY),
                    due=_struct(value=D, unit=S, system=S, code=S),
                )
            ),
        )
    ),
    action=_arr(
        _struct(
            prefix=S,
            title=S,
            description=S,
            textEquivalent=S,
            priority=S,
            code=_arr(CODEABLE_CONCEPT),
            reason=_arr(CODEABLE_CONCEPT),
            goalId=_arr(S),
            triggerDefinition=_arr(_struct(type=S, name=S)),
            condition=_arr(_struct(kind=S, expression=_EXPRESSION)),
            input=_arr(_DATA_REQUIREMENT),
            output=_arr(_DATA_REQUIREMENT),
            relatedAction=_arr(
                _struct(actionId=S, relationship=S, offsetDuration=S)
            ),
            timingDateTime=S,
            timingPeriod=PERIOD,
            participant=_arr(_struct(type=S, role=CODEABLE_CONCEPT)),
            type=CODEABLE_CONCEPT,
            groupingBehavior=S,
            selectionBehavior=S,
            requiredBehavior=S,
            precheckBehavior=S,
            cardinalityBehavior=S,
            definitionCanonical=S,
            definitionUri=S,
            transform=S,
            dynamicValue=_arr(_struct(path=S, expression=_EXPRESSION)),
            # recursive in the spec — one level deep, ConceptMap style
            action=_arr(
                _struct(
                    title=S,
                    description=S,
                    definitionCanonical=S,
                    condition=_arr(
                        _struct(kind=S, expression=_EXPRESSION)
                    ),
                )
            ),
        )
    ),
)


# Round-14 ELEVENTH batch (the clinical-research pair, hl7.org/fhir/
# R4): ResearchStudy / ResearchSubject — the trial-linkage resources a
# research data warehouse loads to join patients onto protocols
# (ResearchSubject is the Patient↔ResearchStudy association with arm
# assignment and enrollment period; OMOP's episode/cohort analytics
# consume exactly this linkage). Monotone promotion: spine fields
# retained.

RESEARCH_STUDY = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    title=S,
    protocol=_arr(REFERENCE),
    partOf=_arr(REFERENCE),
    status=S,
    primaryPurposeType=CODEABLE_CONCEPT,
    phase=CODEABLE_CONCEPT,
    category=_arr(CODEABLE_CONCEPT),
    focus=_arr(CODEABLE_CONCEPT),
    condition=_arr(CODEABLE_CONCEPT),
    keyword=_arr(CODEABLE_CONCEPT),
    location=_arr(CODEABLE_CONCEPT),
    description=S,
    enrollment=_arr(REFERENCE),
    period=PERIOD,
    sponsor=REFERENCE,
    principalInvestigator=REFERENCE,
    site=_arr(REFERENCE),
    reasonStopped=CODEABLE_CONCEPT,
    note=_arr(ANNOTATION),
    arm=_arr(_struct(name=S, type=CODEABLE_CONCEPT, description=S)),
    objective=_arr(_struct(name=S, type=CODEABLE_CONCEPT)),
)

RESEARCH_SUBJECT = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    status=S,
    period=PERIOD,
    study=REFERENCE,
    individual=REFERENCE,
    assignedArm=S,
    actualArm=S,
    consent=REFERENCE,
)


# Round-15 TWELFTH batch (the order-set EXECUTION pair, hl7.org/fhir/
# R4): ActivityDefinition / RequestGroup — the companions of the
# round-14 PlanDefinition batch. PlanDefinition is the protocol,
# ActivityDefinition the reusable order template it instantiates, and
# RequestGroup the per-patient "apply" result whose
# `instantiatesCanonical` links the executed orders back to their
# definitions (CDS-Hooks / $apply output lands as RequestGroups).
# RequestGroup.action is recursive in the spec — captured one level
# deep, the ConceptMap/PlanDefinition precedent. Monotone promotion:
# spine fields retained.

ACTIVITY_DEFINITION = _resource(
    **_SPINE_FIELDS,
    url=S,
    identifier=_arr(IDENTIFIER),
    version=S,
    name=S,
    title=S,
    subtitle=S,
    status=S,
    experimental=B,
    subjectCodeableConcept=CODEABLE_CONCEPT,
    subjectReference=REFERENCE,
    date=S,
    publisher=S,
    description=S,
    purpose=S,
    usage=S,
    approvalDate=S,
    lastReviewDate=S,
    effectivePeriod=PERIOD,
    topic=_arr(CODEABLE_CONCEPT),
    library=_arr(S),
    kind=S,
    profile=S,
    code=CODEABLE_CONCEPT,
    intent=S,
    priority=S,
    doNotPerform=B,
    timingDateTime=S,
    timingPeriod=PERIOD,
    timingDuration=_struct(value=D, unit=S, system=S, code=S),
    location=REFERENCE,
    participant=_arr(_struct(type=S, role=CODEABLE_CONCEPT)),
    productReference=REFERENCE,
    productCodeableConcept=CODEABLE_CONCEPT,
    quantity=QUANTITY,
    dosage=_arr(_struct(sequence=I, text=S, asNeededBoolean=B)),
    bodySite=_arr(CODEABLE_CONCEPT),
    specimenRequirement=_arr(REFERENCE),
    observationRequirement=_arr(REFERENCE),
    observationResultRequirement=_arr(REFERENCE),
    transform=S,
    dynamicValue=_arr(_struct(path=S, expression=_EXPRESSION)),
)

REQUEST_GROUP = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    instantiatesCanonical=_arr(S),
    instantiatesUri=_arr(S),
    basedOn=_arr(REFERENCE),
    replaces=_arr(REFERENCE),
    groupIdentifier=IDENTIFIER,
    status=S,
    intent=S,
    priority=S,
    code=CODEABLE_CONCEPT,
    subject=REFERENCE,
    encounter=REFERENCE,
    authoredOn=S,
    author=REFERENCE,
    reasonCode=_arr(CODEABLE_CONCEPT),
    reasonReference=_arr(REFERENCE),
    note=_arr(ANNOTATION),
    action=_arr(
        _struct(
            prefix=S,
            title=S,
            description=S,
            textEquivalent=S,
            priority=S,
            code=_arr(CODEABLE_CONCEPT),
            condition=_arr(_struct(kind=S, expression=_EXPRESSION)),
            relatedAction=_arr(
                _struct(actionId=S, relationship=S, offsetDuration=S)
            ),
            timingDateTime=S,
            timingPeriod=PERIOD,
            participant=_arr(REFERENCE),
            type=CODEABLE_CONCEPT,
            groupingBehavior=S,
            selectionBehavior=S,
            requiredBehavior=S,
            precheckBehavior=S,
            cardinalityBehavior=S,
            resource=REFERENCE,
            # recursive in the spec — one level deep, ConceptMap style
            action=_arr(
                _struct(
                    title=S,
                    description=S,
                    resource=REFERENCE,
                    condition=_arr(
                        _struct(kind=S, expression=_EXPRESSION)
                    ),
                )
            ),
        )
    ),
)


# Round-15b THIRTEENTH batch (the payer/knowledge pair, hl7.org/fhir/
# R4): MedicationKnowledge / Contract — the definitional drug-catalog
# side of the medication family (MedicationRequest/Administration/
# Dispense/Statement are all curated since r8-r11; MedicationKnowledge
# is the formulary record their codes resolve against, cost + dose-form
# + regulatory) and the payer agreement resource the Coverage/
# InsurancePlan/PaymentReconciliation flow executes under. Recursive
# Contract.term is captured one level deep (the ConceptMap/RequestGroup
# precedent). Monotone promotion: spine fields retained.

_RATIO = _struct(
    numerator=QUANTITY,
    denominator=QUANTITY,
)

MEDICATION_KNOWLEDGE = _resource(
    **_SPINE_FIELDS,
    code=CODEABLE_CONCEPT,
    status=S,
    manufacturer=REFERENCE,
    doseForm=CODEABLE_CONCEPT,
    amount=QUANTITY,
    synonym=_arr(S),
    relatedMedicationKnowledge=_arr(
        _struct(type=CODEABLE_CONCEPT, reference=_arr(REFERENCE))
    ),
    associatedMedication=_arr(REFERENCE),
    productType=_arr(CODEABLE_CONCEPT),
    monograph=_arr(_struct(type=CODEABLE_CONCEPT, source=REFERENCE)),
    ingredient=_arr(
        _struct(
            itemCodeableConcept=CODEABLE_CONCEPT,
            itemReference=REFERENCE,
            isActive=B,
            strength=_RATIO,
        )
    ),
    preparationInstruction=S,
    intendedRoute=_arr(CODEABLE_CONCEPT),
    cost=_arr(_struct(type=CODEABLE_CONCEPT, source=S, cost=MONEY)),
    monitoringProgram=_arr(_struct(type=CODEABLE_CONCEPT, name=S)),
    administrationGuidelines=_arr(
        _struct(
            dosage=_arr(
                _struct(
                    type=CODEABLE_CONCEPT,
                    dosage=_arr(_struct(sequence=I, text=S)),
                )
            ),
            indicationCodeableConcept=CODEABLE_CONCEPT,
            indicationReference=REFERENCE,
        )
    ),
    medicineClassification=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            classification=_arr(CODEABLE_CONCEPT),
        )
    ),
    packaging=_struct(type=CODEABLE_CONCEPT, quantity=QUANTITY),
    drugCharacteristic=_arr(
        _struct(
            type=CODEABLE_CONCEPT,
            valueCodeableConcept=CODEABLE_CONCEPT,
            valueString=S,
            valueQuantity=QUANTITY,
            valueBase64Binary=S,
        )
    ),
    contraindication=_arr(REFERENCE),
    regulatory=_arr(
        _struct(
            regulatoryAuthority=REFERENCE,
            substitution=_arr(
                _struct(type=CODEABLE_CONCEPT, allowed=B)
            ),
            schedule=_arr(_struct(schedule=CODEABLE_CONCEPT)),
            maxDispense=_struct(
                quantity=QUANTITY,
                period=_struct(value=D, unit=S, system=S, code=S),
            ),
        )
    ),
    kinetics=_arr(
        _struct(
            areaUnderCurve=_arr(QUANTITY),
            lethalDose50=_arr(QUANTITY),
            halfLifePeriod=_struct(value=D, unit=S, system=S, code=S),
        )
    ),
)

_CONTRACT_TERM_OFFER = _struct(
    identifier=_arr(IDENTIFIER),
    party=_arr(
        _struct(reference=_arr(REFERENCE), role=CODEABLE_CONCEPT)
    ),
    topic=REFERENCE,
    type=CODEABLE_CONCEPT,
    decision=CODEABLE_CONCEPT,
    decisionMode=_arr(CODEABLE_CONCEPT),
    text=S,
    linkId=_arr(S),
    securityLabelNumber=_arr(I),
)

CONTRACT = _resource(
    **_SPINE_FIELDS,
    identifier=_arr(IDENTIFIER),
    url=S,
    version=S,
    status=S,
    legalState=CODEABLE_CONCEPT,
    instantiatesCanonical=REFERENCE,
    instantiatesUri=S,
    contentDerivative=CODEABLE_CONCEPT,
    issued=S,
    applies=PERIOD,
    expirationType=CODEABLE_CONCEPT,
    subject=_arr(REFERENCE),
    authority=_arr(REFERENCE),
    domain=_arr(REFERENCE),
    site=_arr(REFERENCE),
    name=S,
    title=S,
    subtitle=S,
    alias=_arr(S),
    author=REFERENCE,
    scope=CODEABLE_CONCEPT,
    topicCodeableConcept=CODEABLE_CONCEPT,
    topicReference=REFERENCE,
    type=CODEABLE_CONCEPT,
    subType=_arr(CODEABLE_CONCEPT),
    contentDefinition=_struct(
        type=CODEABLE_CONCEPT,
        subType=CODEABLE_CONCEPT,
        publisher=REFERENCE,
        publicationDate=S,
        publicationStatus=S,
        copyright=S,
    ),
    term=_arr(
        _struct(
            identifier=IDENTIFIER,
            issued=S,
            applies=PERIOD,
            topicCodeableConcept=CODEABLE_CONCEPT,
            topicReference=REFERENCE,
            type=CODEABLE_CONCEPT,
            subType=CODEABLE_CONCEPT,
            text=S,
            securityLabel=_arr(
                _struct(
                    number=_arr(I),
                    classification=CODING,
                    category=_arr(CODING),
                    control=_arr(CODING),
                )
            ),
            offer=_CONTRACT_TERM_OFFER,
            asset=_arr(
                _struct(
                    scope=CODEABLE_CONCEPT,
                    type=_arr(CODEABLE_CONCEPT),
                    typeReference=_arr(REFERENCE),
                    subtype=_arr(CODEABLE_CONCEPT),
                    relationship=CODING,
                    condition=S,
                    periodType=_arr(CODEABLE_CONCEPT),
                    period=_arr(PERIOD),
                    usePeriod=_arr(PERIOD),
                    text=S,
                    linkId=_arr(S),
                    securityLabelNumber=_arr(I),
                    valuedItem=_arr(
                        _struct(
                            entityCodeableConcept=CODEABLE_CONCEPT,
                            entityReference=REFERENCE,
                            identifier=IDENTIFIER,
                            effectiveTime=S,
                            quantity=QUANTITY,
                            unitPrice=MONEY,
                            factor=D,
                            points=D,
                            net=MONEY,
                            payment=S,
                            paymentDate=S,
                            responsible=REFERENCE,
                            recipient=REFERENCE,
                        )
                    ),
                )
            ),
            action=_arr(
                _struct(
                    doNotPerform=B,
                    type=CODEABLE_CONCEPT,
                    subject=_arr(
                        _struct(
                            reference=_arr(REFERENCE),
                            role=CODEABLE_CONCEPT,
                        )
                    ),
                    intent=CODEABLE_CONCEPT,
                    linkId=_arr(S),
                    status=CODEABLE_CONCEPT,
                    context=REFERENCE,
                    occurrenceDateTime=S,
                    occurrencePeriod=PERIOD,
                    requester=_arr(REFERENCE),
                    performerType=_arr(CODEABLE_CONCEPT),
                    performerRole=CODEABLE_CONCEPT,
                    performer=REFERENCE,
                    reasonCode=_arr(CODEABLE_CONCEPT),
                    reason=_arr(S),
                    note=_arr(ANNOTATION),
                    securityLabelNumber=_arr(I),
                )
            ),
            # recursive in the spec — one level deep, the ConceptMap/
            # RequestGroup convention
            group=_arr(
                _struct(
                    type=CODEABLE_CONCEPT,
                    subType=CODEABLE_CONCEPT,
                    text=S,
                    offer=_CONTRACT_TERM_OFFER,
                )
            ),
        )
    ),
    supportingInfo=_arr(REFERENCE),
    relevantHistory=_arr(REFERENCE),
    signer=_arr(
        _struct(
            type=CODING,
            party=REFERENCE,
            signature=_arr(
                _struct(
                    type=_arr(CODING),
                    when=S,
                    who=REFERENCE,
                    sigFormat=S,
                    data=S,
                )
            ),
        )
    ),
    friendly=_arr(
        _struct(contentAttachment=ATTACHMENT, contentReference=REFERENCE)
    ),
    legal=_arr(
        _struct(contentAttachment=ATTACHMENT, contentReference=REFERENCE)
    ),
    rule=_arr(
        _struct(contentAttachment=ATTACHMENT, contentReference=REFERENCE)
    ),
    legallyBindingAttachment=ATTACHMENT,
    legallyBindingReference=REFERENCE,
)


CATALOG = {
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
    "Observation": OBSERVATION,
    "Procedure": PROCEDURE,
    "Immunization": IMMUNIZATION,
    "DiagnosticReport": DIAGNOSTIC_REPORT,
    "AllergyIntolerance": ALLERGY_INTOLERANCE,
    "CarePlan": CARE_PLAN,
    "Device": DEVICE,
    "Goal": GOAL,
    "Medication": MEDICATION,
    "ImagingStudy": IMAGING_STUDY,
    "SupplyDelivery": SUPPLY_DELIVERY,
    "ExplanationOfBenefit": EXPLANATION_OF_BENEFIT,
    "DocumentReference": DOCUMENT_REFERENCE,
    "Provenance": PROVENANCE,
    "MedicationAdministration": MEDICATION_ADMINISTRATION,
    "MedicationDispense": MEDICATION_DISPENSE,
    "MedicationStatement": MEDICATION_STATEMENT,
    "ServiceRequest": SERVICE_REQUEST,
    "Specimen": SPECIMEN,
    "PractitionerRole": PRACTITIONER_ROLE,
    "FamilyMemberHistory": FAMILY_MEMBER_HISTORY,
    "EpisodeOfCare": EPISODE_OF_CARE,
    "Appointment": APPOINTMENT,
    "Communication": COMMUNICATION,
    "Consent": CONSENT,
    "Media": MEDIA,
    "ClaimResponse": CLAIM_RESPONSE,
    "QuestionnaireResponse": QUESTIONNAIRE_RESPONSE,
    "Composition": COMPOSITION,
    "Task": TASK,
    "RiskAssessment": RISK_ASSESSMENT,
    "Schedule": SCHEDULE,
    "Slot": SLOT,
    "AppointmentResponse": APPOINTMENT_RESPONSE,
    "Group": GROUP,
    "List": LIST_RESOURCE,
    "Flag": FLAG,
    "DetectedIssue": DETECTED_ISSUE,
    "ClinicalImpression": CLINICAL_IMPRESSION,
    "DeviceRequest": DEVICE_REQUEST,
    "CommunicationRequest": COMMUNICATION_REQUEST,
    "AdverseEvent": ADVERSE_EVENT,
    "AuditEvent": AUDIT_EVENT,
    "Person": PERSON,
    "Questionnaire": QUESTIONNAIRE,
    "DeviceUseStatement": DEVICE_USE_STATEMENT,
    "NutritionOrder": NUTRITION_ORDER,
    "SupplyRequest": SUPPLY_REQUEST,
    "MeasureReport": MEASURE_REPORT,
    "ImmunizationRecommendation": IMMUNIZATION_RECOMMENDATION,
    "HealthcareService": HEALTHCARE_SERVICE,
    "Endpoint": ENDPOINT,
    "CoverageEligibilityRequest": COVERAGE_ELIGIBILITY_REQUEST,
    "CoverageEligibilityResponse": COVERAGE_ELIGIBILITY_RESPONSE,
    "ChargeItem": CHARGE_ITEM,
    "Invoice": INVOICE,
    "PaymentNotice": PAYMENT_NOTICE,
    "InsurancePlan": INSURANCE_PLAN,
    "OrganizationAffiliation": ORGANIZATION_AFFILIATION,
    "PaymentReconciliation": PAYMENT_RECONCILIATION,
    "OperationOutcome": OPERATION_OUTCOME,
    "DeviceDefinition": DEVICE_DEFINITION,
    "DeviceMetric": DEVICE_METRIC,
    "Substance": SUBSTANCE,
    "CodeSystem": CODE_SYSTEM,
    "ValueSet": VALUE_SET,
    "ConceptMap": CONCEPT_MAP,
    "Measure": MEASURE,
    "Library": LIBRARY,
    "PlanDefinition": PLAN_DEFINITION,
    "ResearchStudy": RESEARCH_STUDY,
    "ResearchSubject": RESEARCH_SUBJECT,
    "ActivityDefinition": ACTIVITY_DEFINITION,
    "RequestGroup": REQUEST_GROUP,
    "MedicationKnowledge": MEDICATION_KNOWLEDGE,
    "Contract": CONTRACT,
}


# ---- full-catalog spine (FhirSchemaModel(full=True)) ----------------------
#
# The remaining R4 resource types (public list, hl7.org/fhir/R4/
# resourcelist.html; Bundle is the envelope the reader itself parses and
# Parameters is not a persistable DomainResource — both excluded). Each
# gets the UNIVERSAL DomainResource spine only — id/meta/implicitRules/
# language/text/extension/modifierExtension — which is honest for every
# type (per-resource fields vary in type across resources, so a deeper
# generic schema would misdeclare some of them; e.g. `identifier` is
# 0..1 on QuestionnaireResponse but 0..* almost everywhere else). The
# spine means full=True RECOGNIZES every R4 resource type (no silent
# drop into `other`), and a user needing deep fields overrides that one
# type via `with_overrides` — the reference's own mechanism.

_SPINE = _resource(
    implicitRules=S,
    language=S,
    text=NARRATIVE,
    extension=_arr(EXTENSION),
    modifierExtension=_arr(EXTENSION),
)

# Binary is a plain Resource with typed content fields — worth the exact
# schema instead of the DomainResource spine (it has no text/extension).
BINARY = _resource(contentType=S, data=S, securityContext=REFERENCE)

FULL_SPINE_TYPES = [
    "Basic", "BiologicallyDerivedProduct", "BodyStructure",
    "CapabilityStatement", "CatalogEntry",
    "ChargeItemDefinition",
    "CompartmentDefinition",
    "DocumentManifest", "EffectEvidenceSynthesis",
    "EnrollmentRequest", "EnrollmentResponse", "EventDefinition",
    "Evidence", "EvidenceVariable", "ExampleScenario", 
    "GraphDefinition", "GuidanceResponse", 
    "ImmunizationEvaluation", 
    "ImplementationGuide",
    "Linkage",
    "MedicinalProduct", "MedicinalProductAuthorization",
    "MedicinalProductContraindication", "MedicinalProductIndication",
    "MedicinalProductIngredient", "MedicinalProductInteraction",
    "MedicinalProductManufactured", "MedicinalProductPackaged",
    "MedicinalProductPharmaceutical", "MedicinalProductUndesirableEffect",
    "MessageDefinition", "MolecularSequence", "NamingSystem",
    "ObservationDefinition", "OperationDefinition",
    "ResearchDefinition",
    "ResearchElementDefinition",
    "RiskEvidenceSynthesis", "SearchParameter", "SpecimenDefinition",
    "StructureDefinition", "StructureMap", "Subscription",
    "SubstanceNucleicAcid", "SubstancePolymer", "SubstanceProtein",
    "SubstanceReferenceInformation", "SubstanceSourceMaterial",
    "SubstanceSpecification", "TerminologyCapabilities", "TestReport", "TestScript",
    "VerificationResult", "VisionPrescription",
]

FULL_CATALOG = {name: _SPINE for name in FULL_SPINE_TYPES}
FULL_CATALOG["Binary"] = BINARY

assert not set(FULL_CATALOG) & set(CATALOG), "spine/curated overlap"


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    for name, st in CATALOG.items():
        path = os.path.join(here, f"{name}.json")
        with open(path, "w") as f:
            json.dump(st.jsonValue(), f, indent=1, sort_keys=True)
            f.write("\n")
    print(f"wrote {len(CATALOG)} schema files to {here}")
    full_dir = os.path.join(here, "full")
    os.makedirs(full_dir, exist_ok=True)
    for name, st in FULL_CATALOG.items():
        path = os.path.join(full_dir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(st.jsonValue(), f, indent=1, sort_keys=True)
            f.write("\n")
    # a type promoted out of the spine set must not leave a stale file
    # behind (curated wins the name collision at load time, but the
    # on-disk catalog should be exactly FULL_CATALOG)
    stale = [
        f for f in os.listdir(full_dir)
        if f.endswith(".json") and f[:-5] not in FULL_CATALOG
    ]
    for f in stale:
        os.remove(os.path.join(full_dir, f))
    print(
        f"wrote {len(FULL_CATALOG)} spine schema files to {full_dir}"
        + (f" (removed {len(stale)} stale)" if stale else "")
    )


if __name__ == "__main__":
    main()
