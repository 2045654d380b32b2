"""FHIR subsystem: bundle ingestion (reader/schema model/sinks), ADT action
semantics, and the reverse DataFrame→FHIR writer.

Capability parity targets (reference: /root/reference/01_dbignite_sample.py):
- ``read_from_directory(path).entry(schemas=...)``   (:25-26, :145-146, :416-417)
- ``FhirSchemaModel(fhir_resource_map=...)``         (:141-146)
- ``bulk_table_write(location, write_mode, columns)`` (:221-223, :425-427)
- ``ADTActions()`` / ``get_action`` SQL UDF          (:410-414, :440-441)
- ``Mapping/MappingManager/FhirEncoder(Manager)/Bundle.df_to_fhir`` (:520-542)
"""

from interop_spark.fhir.adt import ADTActions  # noqa: F401
from interop_spark.fhir.reader import (  # noqa: F401
    FhirBundles,
    FhirNdjson,
    bundles_from_ndjson,
    read_from_directory,
    read_from_ndjson,
)
from interop_spark.fhir.schema import FhirSchemaModel  # noqa: F401
from interop_spark.fhir.writer import (  # noqa: F401
    Bundle,
    FhirEncoder,
    FhirEncoderManager,
    Mapping,
    MappingManager,
)
