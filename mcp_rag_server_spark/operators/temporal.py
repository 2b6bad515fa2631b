"""Temporal join operators: as-of join and bounded range join.

Neither exists in the reference (SURVEY.md §2.3 — no join operator at
all) and neither is a Spark builtin, so these are the "custom operator
as composition" case (build-spec: compose existing DataFrame ops before
reaching for UDFs):

- **as-of join** = union the two inputs tagged, one window pass per key
  with ``last(ignorenulls)`` over rows-unbounded-preceding. ONE shuffle
  on the join key, state = one value per key — the classic distributed
  as-of shape (a sort-merge band join would need a range condition Spark
  can only nested-loop). The DuckDB oracle uses its *native* ASOF JOIN,
  so our composition is checked against a first-class implementation.

- **bounded range join** = bucketize time to the range width, explode
  the left side to its two candidate buckets, equi-join on
  (key, bucket), re-filter the exact interval. Turns an
  O(n²)-per-key theta join into a shuffle equi-join whose per-bucket
  fan-in is bounded by event density × range width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

RANGE_GAP_US = 5 * 60 * 1_000_000  # 5 minutes


@register(
    "tj_asof_last_order",
    oracle="""
SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
ORDER BY e.event_id
""",
    description="as-of join (events x orders): union + keyed window with"
    " last(ignorenulls) vs DuckDB's native ASOF JOIN",
    tags=("temporal", "asof", "join"),
    bench=True,
)
def tj_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order date at-or-before the
    event time. Order rows sort before event rows at equal timestamps
    (src 0 < 1), so an order on the event's own timestamp matches —
    ASOF's <= semantics."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("od_date"),
        F.lit(1).alias("src"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").cast("timestamp").alias("od_date"),
        F.lit(0).alias("src"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.unionByName(od)
        .withColumn("last_order_date", F.last("od_date", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
        .select("event_id", "user_id", "ts", "last_order_date")
        .orderBy("event_id")
    )


@register(
    "tj_range_pairs_5min",
    oracle=f"""
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND epoch_us(b.ts) >  epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + {RANGE_GAP_US}
GROUP BY a.user_id
ORDER BY a.user_id
""",
    description="bounded range self-join (pairs of same-user events within"
    " 5 min) via time-bucket equi-join",
    tags=("temporal", "range", "join"),
)
def tj_range_pairs_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: ordered event pairs (a, b) with b within (0, 5min] after
    a. The left side explodes to its two candidate buckets; the right
    joins on its own bucket — every qualifying pair lands in exactly one
    bucket, so no dedup is needed and the join is a plain shuffle
    equi-join on (user_id, bucket)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    a = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                F.floor(F.col("us") / RANGE_GAP_US),
                F.floor(F.col("us") / RANGE_GAP_US) + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        F.floor(F.col("us") / RANGE_GAP_US).alias("b_bucket"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("bucket") == F.col("b_bucket"))
            & (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") <= F.col("a_us") + RANGE_GAP_US),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )
