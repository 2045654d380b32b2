"""interop_spark — a PySpark-native analytics engine with the capability
surface of databricks-industry-solutions/interop (dbignite), rebuilt
Spark-first.

Subpackages
-----------
fhir       : FHIR bundle ingestion (reader/schema/sinks) and the reverse
             DataFrame→FHIR writer (Mapping/MappingManager/Bundle).
operators  : large-scale training-data-pipeline operators — dedup
             (exact/minhash-LSH/simhash), similarity search, text analysis,
             multimodal column plumbing.
queries    : named query library; each query has a DuckDB oracle-SQL twin
             used by the driver's correctness gate.
session    : tuned local SparkSession builder (AQE, shuffle partitions,
             nested-schema pruning).
"""

__version__ = "0.1.0"

from interop_spark.session import get_spark  # noqa: F401
