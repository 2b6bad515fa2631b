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
-- ts IS NOT NULL: an undated change cannot be versioned into a
-- validity interval (and NULL ts sorts FIRST in Spark's lead window
-- vs LAST in DuckDB's, flipping which row is 'current')
FROM events WHERE ts IS NOT NULL
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
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # an undated change cannot be versioned
    )
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


#: IVM timeline split: the last quarter of the [min, max] event-time
#: span is the delta batch; 'error' events retract (weight −1).
IVM_NUM, IVM_DEN = 3, 4
IVM_RETRACT_TYPE = "error"


@register(
    "ev_ivm_delta_rollup",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
tagged AS (
  SELECT e.user_id,
         CASE WHEN e.event_type = '{IVM_RETRACT_TYPE}' THEN -1 ELSE 1 END
           AS sgn,
         CAST(CASE WHEN isnan(e.value) OR abs(e.value) = CAST('Infinity' AS DOUBLE) THEN NULL ELSE e.value END AS DECIMAL(18,4)) AS dval,
         (epoch_us(e.ts) >= b.lo + (b.hi - b.lo) * {IVM_NUM} // {IVM_DEN})
           AS is_delta
  FROM events e CROSS JOIN bounds b
),
base AS (
  SELECT user_id, CAST(SUM(sgn) AS BIGINT) AS cnt, SUM(sgn * dval) AS val
  FROM tagged WHERE NOT is_delta GROUP BY user_id
),
delta AS (
  SELECT user_id, CAST(SUM(sgn) AS BIGINT) AS cnt, SUM(sgn * dval) AS val
  FROM tagged WHERE is_delta GROUP BY user_id
),
merged AS (
  SELECT COALESCE(b.user_id, d.user_id) AS user_id,
         COALESCE(b.cnt, 0) + COALESCE(d.cnt, 0) AS cnt,
         COALESCE(b.val, 0) + COALESCE(d.val, 0) AS val,
         (b.user_id IS NOT NULL) AS in_base,
         (d.user_id IS NOT NULL) AS in_delta
  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
),
kept AS (SELECT * FROM merged WHERE cnt <> 0),
recomputed AS (
  SELECT user_id, CAST(SUM(sgn) AS BIGINT) AS cnt, SUM(sgn * dval) AS val
  FROM tagged GROUP BY user_id HAVING SUM(sgn) <> 0
),
chk AS (
  SELECT BOOL_AND(k.user_id IS NOT NULL AND r.user_id IS NOT NULL
                  AND k.cnt = r.cnt AND k.val = r.val) AS matches_recompute
  FROM kept k FULL OUTER JOIN recomputed r ON k.user_id = r.user_id
)
SELECT (SELECT COUNT(*) FROM base) AS n_base_groups,
       (SELECT COUNT(*) FROM delta) AS n_delta_groups,
       (SELECT COUNT(*) FROM merged WHERE in_delta AND NOT in_base)
         AS n_new_groups,
       (SELECT COUNT(*) FROM merged WHERE cnt = 0) AS n_dropped_groups,
       (SELECT COUNT(*) FROM kept) AS n_final_groups,
       (SELECT CAST(SUM(cnt) AS BIGINT) FROM kept) AS total_events_net,
       (SELECT CAST(SUM(val) AS DOUBLE) FROM kept) AS total_value_net,
       (SELECT matches_recompute FROM chk) AS matches_recompute
""",
    description="incremental view maintenance: a per-user signed"
    " count/sum rollup maintained from the materialized base state"
    " plus ONLY the delta batch (last quarter of the timeline; 'error'"
    " events retract), with drop-on-zero group deletion and the"
    " merged-equals-full-recompute identity hashed beside the group"
    " churn census — delta-sized work instead of a 100 TB recompute",
    tags=("events", "cdc", "agg", "ivm"),
    bench=True,
)
def ev_ivm_delta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance shape behind every materialized rollup: SUM and
    COUNT are self-maintainable under inserts AND retractions (signed
    multiplicity — 'error' rows carry weight −1, the compensating-
    event convention of retraction streams), so the new view state is
    old state FULL OUTER JOIN delta aggregate with coalesced
    arithmetic, deleting groups whose signed count reaches zero — no
    rescan of the base data. The hashed row carries the churn census
    (new / dropped / final groups), the maintained totals (exact
    decimal sums), and the identity boolean against a full recompute —
    associativity guarantees it holds, and the audit pins that the
    merge machinery (join keys, coalesce defaults, drop rule) actually
    implements the algebra. At 100 TB the base aggregate is the stored
    view keyed by group — the merge is a delta-sized shuffle joined
    against it; the cutoff here is derived from the data (one bounds
    pass) purely to make the fixture split deterministic, where a real
    pipeline uses the batch boundary it already knows."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    tagged = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.when(F.col("event_type") == IVM_RETRACT_TYPE, -1)
            .otherwise(1)
            .alias("sgn"),
            F.col("value").cast("decimal(18,4)").alias("dval"),
            (
                F.unix_micros("ts")
                >= F.col("lo")
                + F.expr(f"(hi - lo) * {IVM_NUM} DIV {IVM_DEN}")
            ).alias("is_delta"),
        )
        # `tagged` feeds base, delta AND the recompute check, and the
        # census ladder below re-reads their descendants — Catalyst
        # re-inlines the events scan + bounds cross join into every
        # branch (the re-inlined-CTE trap: the r14 before-plan shows
        # THIRTY-SIX parquet scans). One eager checkpoint of the
        # corpus-cost stage (narrow 4-column rows) cuts that to the
        # two real scans (bounds + tagged); the downstream aggregates
        # are group-count-sized and stay as concurrent stages
        # (r14 interleaved A/B: x0.86).
    )
    tagged = tagged.localCheckpoint(eager=True)

    def signed_agg(df):
        return df.groupBy("user_id").agg(
            F.sum("sgn").cast("bigint").alias("cnt"),
            F.sum(F.col("sgn") * F.col("dval")).alias("val"),
        )

    base = signed_agg(tagged.filter(~F.col("is_delta")))
    delta = signed_agg(tagged.filter(F.col("is_delta")))
    merged = (
        base.select(
            F.col("user_id"),
            F.col("cnt").alias("cnt_b"),
            F.col("val").alias("val_b"),
        )
        .join(
            delta.select(
                F.col("user_id"),
                F.col("cnt").alias("cnt_d"),
                F.col("val").alias("val_d"),
            ),
            "user_id",
            "full",
        )
        .select(
            "user_id",
            (
                F.coalesce(F.col("cnt_b"), F.lit(0))
                + F.coalesce(F.col("cnt_d"), F.lit(0))
            ).alias("cnt"),
            (
                F.coalesce(F.col("val_b"), F.lit(0))
                + F.coalesce(F.col("val_d"), F.lit(0))
            ).alias("val"),
            F.col("cnt_b").isNotNull().alias("in_base"),
            F.col("cnt_d").isNotNull().alias("in_delta"),
        )
    )
    kept = merged.filter(F.col("cnt") != 0)
    recomputed = signed_agg(tagged).filter(F.col("cnt") != 0)
    chk = (
        kept.select(
            "user_id",
            F.col("cnt").alias("cnt_k"),
            F.col("val").alias("val_k"),
        )
        .join(
            recomputed.select(
                "user_id",
                F.col("cnt").alias("cnt_r"),
                F.col("val").alias("val_r"),
            ),
            "user_id",
            "full",
        )
        .agg(
            F.bool_and(
                F.col("cnt_k").isNotNull()
                & F.col("cnt_r").isNotNull()
                & (F.col("cnt_k") == F.col("cnt_r"))
                & (F.col("val_k") == F.col("val_r"))
            ).alias("matches_recompute")
        )
    )
    base_n = base.agg(F.count("*").alias("n_base_groups"))
    delta_n = delta.agg(F.count("*").alias("n_delta_groups"))
    merged_n = merged.agg(
        F.count(F.when(F.col("in_delta") & ~F.col("in_base"), 1)).alias(
            "n_new_groups"
        ),
        F.count(F.when(F.col("cnt") == 0, 1)).alias("n_dropped_groups"),
    )
    kept_n = kept.agg(
        F.count("*").alias("n_final_groups"),
        F.sum("cnt").cast("bigint").alias("total_events_net"),
        F.sum("val").cast("double").alias("total_value_net"),
    )
    return (
        base_n.crossJoin(F.broadcast(delta_n))
        .crossJoin(F.broadcast(merged_n))
        .crossJoin(F.broadcast(kept_n))
        .crossJoin(F.broadcast(chk))
        .select(
            "n_base_groups",
            "n_delta_groups",
            "n_new_groups",
            "n_dropped_groups",
            "n_final_groups",
            "total_events_net",
            "total_value_net",
            "matches_recompute",
        )
    )
