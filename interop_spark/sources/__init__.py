"""Source connectors — the engine's ingestion surface in one place.

- parquet fixture tables: ``load`` / ``register_views`` (interop_spark.io)
- FHIR bundle directories (batch): ``read_from_directory``
- FHIR bundle directories (streaming): ``stream_bundles_from_directory``
- JSON-lines event feeds (streaming): ``stream_events_json``
"""

from interop_spark.fhir.reader import FhirBundles, read_from_directory  # noqa: F401
from interop_spark.io import TABLES, load, register_views  # noqa: F401
from interop_spark.streaming.streams import (  # noqa: F401
    stream_bundles_from_directory,
    stream_events_json,
)
