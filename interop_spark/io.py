"""Fixture-table loading for the driver's TPC-H-ish parquet testdata.

``load(spark, sf_dir, name)`` returns a DataFrame for one table;
``register_views`` registers all of them as temp views so queries can be
written in pure SQL (mirroring the reference's ``%sql`` cells,
`01_dbignite_sample.py:232-243`).

Scale note: these are plain parquet scans — Catalyst pushes filters and
prunes columns into the FileScan, so a query that touches 2 of lineitem's
11 columns reads 2 column chunks, at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS) which the Spark
        # parquet reader rejects; read nanos as long and convert to a
        # microsecond timestamp engine-side (runtime-settable legacy conf,
        # applied here so it also holds under a caller-provided session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer `div`, not `/`: epoch-nanos exceed double's 2^53 mantissa
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each fixture table as a temp view named after itself."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
