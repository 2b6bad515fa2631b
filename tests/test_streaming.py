"""Streaming-specific tests beyond the registry parity gate: the
foreachBatch MERGE sink (idempotent upsert keyed by event_id)."""

from __future__ import annotations

import os

from mcp_rag_server_spark.streaming.events_stream import merge_events_stream

SF0001 = "/root/testdata/sf0.001"


def test_foreach_batch_merge_idempotent(spark, tmp_path):
    target = str(tmp_path / "merge1")
    merge_events_stream(spark, SF0001, target)
    merged = spark.read.parquet(os.path.join(target, "events_merged"))
    n_src = spark.read.parquet(os.path.join(SF0001, "events.parquet")).count()
    n_distinct = merged.select("event_id").distinct().count()
    assert merged.count() == n_distinct  # one row per key after upsert
    assert n_distinct <= n_src

    # Replaying the same stream into a fresh checkpoint must not add rows
    # (the MERGE is keyed, so duplicates collapse).
    import shutil

    shutil.rmtree(os.path.join(target, "_checkpoint"))
    merge_events_stream(spark, SF0001, target)
    spark.catalog.refreshByPath(os.path.join(target, "events_merged"))
    again = spark.read.parquet(os.path.join(target, "events_merged"))
    assert again.count() == n_distinct


def test_transform_with_state_when_available(spark):
    """Spark 4's transformWithStateInPandas needs protobuf in the Python
    worker; gated as a capability (mcp_rag_server_spark/streaming/
    stateful.py::transform_with_state_available). When available, the
    multi-batch result must equal the batch count/min aggregate."""
    import pytest

    from mcp_rag_server_spark.streaming.stateful import (
        st_transform_with_state,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("protobuf not installed: transformWithState runner unavailable")

    import pyspark.sql.functions as F

    from mcp_rag_server_spark.catalog import load_table

    got = st_transform_with_state(spark, "/root/testdata/sf0.001").collect()
    want = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.min("value").alias("min_value"))
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
