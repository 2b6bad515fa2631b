"""Streaming SCD-1 maintenance: a foreachBatch keyed MERGE that keeps
the latest row per user across micro-batches.

This is the streaming twin of operators/cdc.py::ev_latest_state, and
the general form of the reference's restart-time index maintenance
(reference src/indexer.ts:446-462 — delete+reinsert keyed by path):
every micro-batch upserts its keys' newest state into a snapshot table.
The merge operands are deliberately associative and commutative —
latest = max by (ts, event_id), count = sum — so the final snapshot is
identical no matter how the change log is split into batches, which is
what makes the streaming result hash-comparable to the batch oracle.

Scale shape: each batch shuffles once on the merge key; the snapshot
table is O(distinct keys), not O(events); on Delta/Iceberg the
union+argmax+swap becomes a real MERGE INTO. The plain-parquet swap
here is the same staging discipline sources/ingest.py uses.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

N_SPLIT_FILES = 4

_STATE_COLS = (
    "user_id",
    "last_ts",
    "last_event_id",
    "last_event_type",
    "last_value",
    "n_events",
)


def _batch_snapshot(batch: DataFrame) -> DataFrame:
    """Collapse one micro-batch to per-user (latest row, count)."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    return (
        batch.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(wc).alias("n_events"),
        )
        .filter(F.col("_rn") == 1)
        .select(*_STATE_COLS)
    )


def _merge_snapshots(a: DataFrame, b: DataFrame) -> DataFrame:
    """Associative/commutative merge of two per-user snapshots: latest
    by (ts, event_id), counts add."""
    return (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    "last_ts", "last_event_id", "last_event_type", "last_value"
                )
            ).alias("s"),
            F.sum("n_events").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("s.last_ts").alias("last_ts"),
            F.col("s.last_event_id").alias("last_event_id"),
            F.col("s.last_event_type").alias("last_event_type"),
            F.col("s.last_value").alias("last_value"),
            "n_events",
        )
    )


def applied_batch_id(snapshot_dir: str) -> int:
    """Highest batch_id merged into the snapshot (-1 if none). Stored as
    a ``_batch_id`` sidecar INSIDE the snapshot directory —
    underscore-prefixed, so parquet readers ignore it — and swapped
    atomically with the snapshot itself by the rename in
    :func:`apply_batch`."""
    marker = os.path.join(snapshot_dir, "_batch_id")
    if not os.path.exists(marker):
        return -1
    with open(marker, encoding="ascii") as fh:
        return int(fh.read().strip())


def _recover_snapshot_swap(tgt: str) -> None:
    """Roll an interrupted swap forward (same discipline as
    sources/ingest.py's staged store swap): a crash between the rmtree
    of the old snapshot and the rename of the staged one leaves only
    ``tgt.next``. The staged dir is promoted ONLY when its ``_batch_id``
    marker exists — the marker is written after the parquet write
    completes, so its presence proves completeness; without it (crash
    mid-write, including a FIRST batch where no old snapshot existed)
    the partial dir is discarded and the replayed batch rebuilds it.
    A complete ``tgt.next`` beside a live ``tgt`` is a crash before the
    rmtree: discarded too, since the batch replays against the intact
    snapshot."""
    nxt = tgt + ".next"
    if not os.path.exists(nxt):
        return
    staged_complete = os.path.exists(os.path.join(nxt, "_batch_id"))
    if staged_complete and not os.path.exists(tgt):
        os.rename(nxt, tgt)
    else:
        shutil.rmtree(nxt)


def apply_merge_batch(tgt, batch, batch_id, snapshot_fn, merge_fn) -> None:
    """Generic idempotent foreachBatch MERGE: collapse the micro-batch
    with ``snapshot_fn``, combine with the existing snapshot via the
    associative+commutative ``merge_fn``, and swap atomically. A
    batch_id at or below the snapshot's recorded high-water mark is a
    checkpoint replay (crash after the snapshot swap but before the
    checkpoint commit) and is skipped — re-merging would double-count.
    An interrupted swap from a previous crash is rolled forward first,
    so the pre-merge read never sees a missing snapshot. Shared by the
    SCD-1 merge below and the incremental rollup
    (streaming/rollup_stream.py)."""
    s = batch.sparkSession
    _recover_snapshot_swap(tgt)
    if os.path.exists(tgt) and batch_id <= applied_batch_id(tgt):
        return
    snap = snapshot_fn(batch)
    if os.path.exists(tgt):
        snap = merge_fn(s.read.parquet(tgt), snap)
    nxt = tgt + ".next"
    snap.write.mode("overwrite").parquet(nxt)
    with open(os.path.join(nxt, "_batch_id"), "w", encoding="ascii") as fh:
        fh.write(str(batch_id))
    if os.path.exists(tgt):
        shutil.rmtree(tgt)
    os.rename(nxt, tgt)
    s.catalog.refreshByPath(tgt)


def apply_batch(tgt: str, batch: DataFrame, batch_id: int) -> None:
    """SCD-1 instantiation of :func:`apply_merge_batch`."""
    apply_merge_batch(tgt, batch, batch_id, _batch_snapshot, _merge_snapshots)


def run_scd1_stream(spark: SparkSession, src_dir: str, target_dir: str) -> str:
    """Stream the change-log files one per trigger, merging each batch
    into the snapshot table; returns the snapshot path."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    tgt = os.path.join(target_dir, "latest_state")

    def upsert(batch: DataFrame, batch_id: int) -> None:
        apply_batch(tgt, batch, batch_id)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option(
            "checkpointLocation", os.path.join(target_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return tgt


@register(
    "st_latest_state",
    oracle="""
WITH ranked AS (
  SELECT user_id, ts, event_type, value, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id,
       ts AS last_ts,
       event_type AS last_event_type,
       value AS last_value,
       n_events
FROM ranked WHERE rn = 1
ORDER BY user_id
""",
    description="STREAMING SCD-1: foreachBatch keyed MERGE maintains the"
    " latest-row-per-user snapshot across genuine multi-file"
    " micro-batches; final snapshot hash-matches the batch window oracle"
    " (streaming twin of ev_latest_state)",
    tags=("streaming", "cdc", "events"),
)
def st_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events are split into N files and streamed one file per trigger,
    so the snapshot is genuinely merged N times; because the merge is
    associative+commutative the result equals the batch SCD-1 no matter
    the split. The driver-hashed row set therefore proves both the
    streaming plumbing (checkpointed foreachBatch upsert, idempotent
    under batch replay via the _batch_id sidecar) and the merge
    algebra.

    The digest-keyed temp dir assumes one run per (process, sf_dir) at
    a time — the driver executes registry queries sequentially, and the
    suite runs single-process; concurrent same-sf invocations (e.g.
    pytest-xdist) would wipe each other's live state at the rmtree.
    Same single-writer contract as ingest_compacted's corpus dir."""
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_st_scd1_{digest}")
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(N_SPLIT_FILES).write.mode("overwrite").parquet(src)
    tgt = run_scd1_stream(spark, src, os.path.join(base, "out"))
    return (
        spark.read.parquet(tgt)
        .select(
            "user_id", "last_ts", "last_event_type", "last_value", "n_events"
        )
        .orderBy("user_id")
    )
