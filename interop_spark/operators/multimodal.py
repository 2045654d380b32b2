"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives a
fixed-shape feature vector from the bytes (sha256-seeded) so the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is real
and testable end-to-end.

Scale notes: mapInPandas streams Arrow record batches; peak memory per task
is one batch, not one partition. Keep ``spark.sql.execution.arrow
.maxRecordsPerBatch`` sized so batch_bytes × cores fits the executor. Binary
payloads should live in their own column (parquet keeps them in separate
column chunks, so metadata-only queries never read the bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image(data: bytes, fake: bool = False) -> list[float]:
    """STUB: real decode needs an image library not present here.
    ``fake=True`` → deterministic sha256-derived feature vector with the
    correct shape, so downstream plumbing is exercised for real."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not available in this "
            "environment; pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(data).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas DataFrame chunk is one Arrow batch; the
    loop is vectorized per column where possible and the binary payload is
    dropped from the output (features only travel onward).
    """

    feature_dim = FEATURE_DIM

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # self-contained closure (no interop_spark globals): cloudpickle
        # ships it by value, so executors need no package install
        import hashlib as _hl

        import pandas as pd

        def _decode(b):
            if not fake_decode:
                raise NotImplementedError(
                    "image decode requires an imaging library not available "
                    "in this environment; pass fake_decode=True for the stub"
                )
            digest = _hl.sha256(b).digest()
            return [digest[i] / 255.0 for i in range(feature_dim)]

        for pdf in batches:
            data = pdf["data"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": data.map(lambda b: len(b) if b is not None else 0),
                    "sha256": data.map(
                        lambda b: _hl.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": data.map(
                        lambda b: _decode(b) if b is not None else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan shape: explode frame indices 0..n_frames
    step ``every_n``; the (stubbed) per-frame decode would hang off the
    exploded rows. Pure Column ops — the expensive part parallelizes by
    frame, not by video."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never touch the binary column
    (column pruning keeps the scan on the small columns)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
    )
