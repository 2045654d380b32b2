"""Structured Streaming extension: file-source ingestion with
availableNow trigger, checked for equality against the batch result."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def event_json_dir(spark, sf_dir, tmp_path_factory):
    """Events fixture re-serialized as JSON-lines files (streaming source)."""
    from interop_spark.io import load

    d = tmp_path_factory.mktemp("events_json")
    rows = load(spark, sf_dir, "events").limit(300).collect()
    for chunk in range(3):
        with open(d / f"part{chunk}.json", "w") as f:
            for r in rows[chunk * 100 : (chunk + 1) * 100]:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.isoformat(),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
    return str(d)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "win" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_stream_equals_batch(spark, event_json_dir):
    from interop_spark.streaming import stream_events_json, windowed_event_counts

    stream = windowed_event_counts(stream_events_json(spark, event_json_dir))
    _run_stream(stream, "win")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("win").collect()
    }

    batch_src = spark.read.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        "value double, props string"
    ).json(event_json_dir)
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(batch_src).collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_dedupe(spark, event_json_dir, tmp_path):
    from interop_spark.streaming import stream_events_json, streaming_dedupe

    # duplicate every file's contents into a second file
    import shutil, os

    dup_dir = tmp_path / "dup"
    dup_dir.mkdir()
    for f in os.listdir(event_json_dir):
        shutil.copy(f"{event_json_dir}/{f}", dup_dir / f)
        shutil.copy(f"{event_json_dir}/{f}", dup_dir / f"copy_{f}")

    deduped = streaming_dedupe(stream_events_json(spark, str(dup_dir)))
    _run_stream(deduped, "dedup")
    n = spark.table("dedup").count()
    assert n == 300  # duplicates dropped


def test_stream_bundles(spark, tmp_path):
    from interop_spark.streaming import stream_bundles_from_directory

    d = tmp_path / "stream_bundles"
    d.mkdir()
    import shutil, os

    src = "/root/reference/sampledata/adt_records"
    for f in os.listdir(src):
        shutil.copy(f"{src}/{f}", d / f)
    entry = stream_bundles_from_directory(spark, str(d))
    assert entry.isStreaming
    q = (
        entry.selectExpr("bundleUUID", "size(Patient) AS np", "timestamp")
        .writeStream.format("memory")
        .queryName("bundles")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("bundles").collect()
    assert len(rows) == 4
    assert all(r.np == 1 for r in rows)
    assert all(r.timestamp is not None for r in rows)
