from interop_spark.streaming.streams import (  # noqa: F401
    enrich_events,
    sessionize_stream,
    sessionize_stream_event_time,
    stream_bundles_from_directory,
    stream_events_json,
    stream_ndjson_resources,
    streaming_dedupe,
    windowed_event_counts,
)
