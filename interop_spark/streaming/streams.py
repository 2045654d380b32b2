"""Structured Streaming extension (SURVEY.md §2.8: the reference's ADT
"real-time" section is batch; this module is the engine's streaming path
for the same shapes).

Design: every transformation here is expressed so the SAME function works
on a batch DataFrame and a streaming one (Structured Streaming's core
promise). Tests run with ``trigger(availableNow=True)`` against file
sources and assert equality with the batch result.

At scale: file-source ingestion with ``maxFilesPerTrigger`` backpressure,
watermarks bounding state, window aggregation state in the state store —
all stock Structured Streaming; no custom sinks required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_JSON_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_bundles_from_directory(
    spark: SparkSession, path: str, schemas=None
) -> DataFrame:
    """Streaming twin of ``fhir.read_from_directory(...).entry()``: new
    bundle JSON files appearing under ``path`` become bundle rows.

    Uses the text file source with ``wholetext`` (one row per file), then
    the same variant-based extraction as the batch reader.
    """
    from interop_spark.fhir.reader import _uuid_from_md5
    from interop_spark.fhir.schema import FhirSchemaModel

    schemas = schemas or FhirSchemaModel()
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(F.col("value"), F.col("_metadata.file_path").alias("_file_path"))
    )
    v = raw.select(
        _uuid_from_md5(F.md5(F.col("_file_path"))).alias("bundleUUID"),
        F.try_parse_json(F.col("value")).alias("_v"),
    )
    cols = [
        F.col("bundleUUID"),
        F.variant_get("_v", "$.type", "string").alias("bundleType"),
        F.variant_get("_v", "$.timestamp", "string")
        .cast("timestamp")
        .alias("timestamp"),
    ]
    entries = F.variant_get("_v", "$.entry", "array<variant>")

    def _matcher(rt_name):
        return lambda e: (
            F.variant_get(e, "$.resource.resourceType", "string") == F.lit(rt_name)
        )

    def _extractor(ddl):
        return lambda e: F.variant_get(e, "$.resource", ddl)

    for rt in schemas.resource_types():
        typed = F.transform(
            F.filter(entries, _matcher(rt)),
            _extractor(schemas.schema(rt).simpleString()),
        )
        cols.append(F.when(F.size(typed) > 0, typed).alias(rt))
    return v.select(*cols)


def stream_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Streaming event feed from a directory of JSON lines files."""
    return spark.readStream.schema(EVENT_JSON_SCHEMA).json(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data handling.
    Works identically on batch and streaming inputs (watermark is a no-op
    in batch)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.window("ts", window).alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def streaming_dedupe(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event feed: drop duplicate event_ids within the
    watermark horizon (bounded state — the streaming form of the
    reference's J3 dedupe flags)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates(["event_id"])
