from interop_spark.streaming.streams import (  # noqa: F401
    stream_bundles_from_directory,
    stream_events_json,
    streaming_dedupe,
    windowed_event_counts,
)
