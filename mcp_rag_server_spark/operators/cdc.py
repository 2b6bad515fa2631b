"""Change-data-capture shapes over the events table.

The reference's only maintenance notion is the restart-time rescan
(reference src/indexer.ts:413-511) — delete + reinsert keyed by path.
These operators are the general CDC surface a Spark warehouse runs on
any keyed change stream:

- ``ev_latest_state``: SCD-1 compaction — collapse a change log to the
  latest row per key (the MERGE-into-snapshot every CDC sink performs).
- ``ev_scd2_intervals``: SCD-2 history build — turn the same log into
  validity intervals [valid_from, valid_to) per key, the queryable
  "state as of t" table.

Both are single keyed-window shuffles (partitionBy user_id): O(1) state
per key for SCD-1's row_number and SCD-2's lead(), no global sort, no
driver involvement — at 100 TB the shuffle key is the CDC primary key,
exactly how Delta/Iceberg MERGE pipelines lay this out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register


@register(
    "ev_latest_state",
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
    description="SCD-1 CDC compaction: latest row per user_id by"
    " (ts, event_id) plus the change count — the collapse-to-snapshot"
    " every CDC MERGE sink performs",
    tags=("events", "cdc", "window"),
)
def ev_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change log is the events table; the snapshot is row_number=1
    per key under the total order (ts desc, event_id desc) — event_id
    breaks ts ties deterministically, which is the part naïve max(ts)
    implementations get wrong. One shuffle on user_id; both window
    functions share the single sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            "value",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n_events"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            "n_events",
        )
        .orderBy("user_id")
    )


@register(
    "ev_scd2_intervals",
    oracle="""
SELECT user_id,
       event_type AS state,
       value,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to,
       CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM events
ORDER BY user_id, valid_from, state
""",
    description="SCD-2 history build: each change becomes a validity"
    " interval [valid_from, valid_to) per user, open-ended for the"
    " current row — the 'state as of t' table CDC warehouses maintain",
    tags=("events", "cdc", "window", "temporal"),
    bench=True,
)
def ev_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """valid_to = the NEXT change's timestamp (lead over the same keyed
    order SCD-1 uses, ascending), NULL marking the current row. Querying
    'state as of t' is then a range predicate valid_from <= t <
    valid_to, which parquet min/max stats prune. Same single user_id
    shuffle as ev_latest_state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("state"),
            "value",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "state")
    )
