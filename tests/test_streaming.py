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
