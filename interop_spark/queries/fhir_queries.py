"""FHIR-engine queries for the driver contract.

``bundle_collect_flatten`` exercises the entry()-DataFrame semantics
(S3/P1/P3/P5: group-to-array, nested struct build, field-pluck over
array-of-struct, explode back) on the fixture tables with a DuckDB oracle.

The ``ro_``-prefixed queries run the actual FHIR subsystem — reader over
the reference's ADT sample bundles, writer round-trip, multimodal feature
extraction — and use the driver's rows-only check (their outputs are not
expressible as DuckDB SQL over the fixture tables).
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


def ro_fhir_adt_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FHIR path end-to-end (reader → explode → HOF identifier
    extraction → get_action → join → sort): 4 deterministic rows from the
    reference's own sample bundles (rows-only check)."""
    from interop_spark.fhir import read_from_directory
    from interop_spark.fhir.analytics import adt_events

    entry = read_from_directory(ADT_DIR, spark=spark).entry()
    return adt_events(entry)


def ro_fhir_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer path (§2.10): customer rows → FHIR Patient bundles → JSON →
    re-parse engine-side; returns flattened ids (rows-only check)."""
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


def ro_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over mapInPandas: documents' text re-encoded as
    binary payloads → Arrow-batched feature extraction (rows-only check;
    the decode is the deterministic stub)."""
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
    "ro_fhir_adt_timeline": ro_fhir_adt_timeline,
    "ro_fhir_writer_roundtrip": ro_fhir_writer_roundtrip,
    "ro_multimodal_features": ro_multimodal_features,
}

ORACLE = {
    "bundle_collect_flatten": """
        SELECT c_name AS customer_name,
               o_orderkey AS order_id,
               o_orderstatus AS order_status,
               round(o_totalprice, 2) AS billed_amount
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
}
