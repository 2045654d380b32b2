"""FHIR-engine queries for the driver contract.

``bundle_collect_flatten`` exercises the entry()-DataFrame semantics
(S3/P1/P3/P5: group-to-array, nested struct build, field-pluck over
array-of-struct, explode back) on the fixture tables with a DuckDB oracle.

The remaining queries run the actual FHIR subsystem end-to-end, each with
a full value-hash oracle:

- ``fhir_adt_timeline`` — reader over the reference's 4 ADT sample
  bundles; the output is deterministic, so the oracle pins it as a
  VALUES literal (any reader/parser regression flips the hash).
- ``fhir_writer_roundtrip`` — customer rows → FHIR JSON → re-parse; a
  correct writer must reproduce the source rows exactly, so the oracle is
  the source projection itself.
- ``multimodal_features`` — mapInPandas Arrow plumbing with the
  deterministic fake decode; byte length + sha256 are engine-independent,
  so DuckDB computes the same values natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from interop_spark.io import load

ADT_DIR = "file:///root/reference/sampledata/adt_records/"


def q_bundle_collect_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bundle-row semantics on relational data: one 'bundle' per customer
    holding an array<struct> of orders (S3), then explode + dotted-path
    flatten (P1/P3/P5) back to rows — multiset-identical to the flat join,
    which is the oracle."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    bundles = (
        orders.groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(
                    col("o_orderkey").alias("id"),
                    col("o_orderstatus").alias("status"),
                    F.struct(col("o_totalprice").alias("value")).alias("total"),
                )
            ).alias("Order")
        )
        .join(F.broadcast(customer), col("o_custkey") == col("c_custkey"))
    )
    return bundles.select(
        col("c_name").alias("customer_name"),
        F.explode("Order").alias("order"),
    ).select(
        "customer_name",
        col("order.id").alias("order_id"),
        col("order.status").alias("order_status"),
        F.round(col("order.total.value"), 2).alias("billed_amount"),
    )


def q_fhir_adt_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FHIR path end-to-end (reader → explode → HOF identifier
    extraction → get_action → join → sort): 4 deterministic rows from the
    reference's own sample bundles, value-hash-checked against a pinned
    VALUES oracle. The timestamp is rendered as a UTC string so the
    comparison is session-timezone-independent."""
    from interop_spark.fhir import read_from_directory
    from interop_spark.fhir.analytics import adt_events

    entry = read_from_directory(ADT_DIR, spark=spark).entry()
    return adt_events(entry).withColumn(
        "event_timestamp",
        F.date_format(
            F.convert_timezone(None, F.lit("UTC"), col("event_timestamp")),
            "yyyy-MM-dd HH:mm:ss.SSS",
        ),
    )


def q_fhir_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer path (§2.10): customer rows → FHIR Patient bundles → JSON →
    re-parse engine-side. A correct writer reproduces the source rows
    exactly, so the oracle is the source projection — any encoder/mapping
    regression flips the value hash."""
    from interop_spark.fhir import Bundle, Mapping, MappingManager

    src = (
        load(spark, sf_dir, "customer")
        .where(col("c_custkey") < 50)
        .select(
            col("c_custkey").cast("string").alias("CUST_ID"),
            col("c_name").alias("CUST_NAME"),
        )
    )
    maps = [
        Mapping("CUST_ID", "Patient.id"),
        Mapping("CUST_NAME", "Patient.name.text"),
    ]
    emitted = Bundle(MappingManager(maps, src.schema)).df_to_fhir_df(src)
    v = emitted.select(F.try_parse_json(col("value")).alias("v"))
    return v.select(
        F.variant_get("v", "$.entry[0].resource.id", "string").alias("patient_id"),
        F.variant_get(
            "v", "$.entry[0].resource.name[0].text", "string"
        ).alias("patient_name"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over mapInPandas: documents' text re-encoded as
    binary payloads → Arrow-batched feature extraction (the decode is the
    deterministic stub). n_bytes/sha256 are engine-independent functions
    of the payload, so the oracle recomputes them in DuckDB."""
    from interop_spark.operators.multimodal import extract_features

    d = load(spark, sf_dir, "documents").where(col("doc_id") < 100)
    media = d.select(
        col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(col("text"), "utf-8").alias("data"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit("txt").alias("format"),
    )
    out = extract_features(media, fake_decode=True)
    return out.select(
        "media_id", "n_bytes", "sha256", F.size("features").alias("feat_dim")
    )


QUERIES = {
    "bundle_collect_flatten": q_bundle_collect_flatten,
    "fhir_adt_timeline": q_fhir_adt_timeline,
    "fhir_writer_roundtrip": q_fhir_writer_roundtrip,
    "multimodal_features": q_multimodal_features,
}

# the 4 deterministic rows adt_events yields from the reference's sample
# bundles (reference sampledata/adt_records), timestamps pre-rendered UTC
_ADT_ROWS = [
    (
        "555-55-5555", "2023-03-31 22:46:42.163", "ADT_A09",
        "patient departing", "patient departing - tracking", "ADT_A09",
        "http://terminology.hl7.org/CodeSystem/v2-0354", "Carl", "Carlson",
        "1960-05-06", "male", "123456789driver1", "123456",
    ),
    (
        "555-55-5555", "2023-03-30 13:38:48.516", "ADT_A01",
        "admit", "admit a patient as an inpatient", "ADT_A01",
        "http://terminology.hl7.org/CodeSystem/v2-0354", "Carl", "Carlson",
        "1960-05-06", "male", "123456789driver1", "123456",
    ),
    (
        "101-01-0001", "2023-03-31 22:36:42.939", "ADT_A31",
        "update person info", "update person or patient information",
        "ADT_A31", "http://terminology.hl7.org/CodeSystem/v2-0354",
        "Timothy", "Bixby", "2008-01-06", "male", None, None,
    ),
    (
        "101-01-0001", "2023-03-31 22:36:24.844", "ADT_A28",
        "add person info", "add person or patient information",
        "ADT_A28", "http://terminology.hl7.org/CodeSystem/v2-0354",
        "Timothy", "Bixby", "2008-01-06", "male", None, None,
    ),
]

_ADT_COLS = (
    "ssn", "event_timestamp", "adt_type", "action", "description", "code",
    "system", "first_name", "last_name", "birthDate", "gender",
    "drivers_license_id", "empi_id",
)


def _adt_values_sql() -> str:
    def lit(v) -> str:
        if v is None:
            return "CAST(NULL AS VARCHAR)"
        return "'" + v.replace("'", "''") + "'"

    rows = ",\n          ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in _ADT_ROWS
    )
    cols = ", ".join(f'"{c}"' for c in _ADT_COLS)
    return (
        f"SELECT * FROM (VALUES\n          {rows}\n        ) AS t({cols})"
    )


ORACLE = {
    "bundle_collect_flatten": """
        SELECT c_name AS customer_name,
               o_orderkey AS order_id,
               o_orderstatus AS order_status,
               round(o_totalprice, 2) AS billed_amount
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "fhir_adt_timeline": _adt_values_sql(),
    "fhir_writer_roundtrip": """
        SELECT CAST(c_custkey AS VARCHAR) AS patient_id,
               c_name AS patient_name
        FROM customer WHERE c_custkey < 50
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256,
               CAST(16 AS INTEGER) AS feat_dim
        FROM documents WHERE doc_id < 100
    """,
}
