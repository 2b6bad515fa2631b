"""Map-typed WRITE path: building, filtering, and merging MapType
columns with the map higher-order functions.

operators/events.py::ev_props_map_stats READS a map (from_json over the
events property bag); this module registers the other direction — the
engine produces maps with ``map_from_entries``, merges two maps
key-wise with ``map_zip_with``, and prunes one with ``map_filter`` —
so the whole MapType HOF surface (construct / combine / filter /
element_at / explode) is driver-checked, not just map consumption.

The reference stores its per-document metadata as a JSON object keyed
by name (reference src/types.ts:5-20, src/persistence.ts:159-179);
a map column is the Spark-native typed form of that bag.

Scale shape: one (user_id, event_type) partial aggregation (map-side
combine), one user_id aggregation building the maps; the HOF stages are
pure column math inside whole-stage codegen — no extra shuffle, no
Python. Map cardinality per user is bounded by the event-type alphabet,
so per-row state is O(|types|), never O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.numeric import finite_col
from mcp_rag_server_spark.registry import register

#: A (user, event_type) pair is "frequent" at or above this many events.
#: sf0.01 pair counts span 3..24 (median 13), so 15 keeps a strict,
#: non-vacuous subset on the driver's comparison fixture.
MAP_MIN_EVENTS = 15


@register(
    "ev_user_type_count_map",
    oracle=f"""
WITH ent AS (
  -- event_type IS NOT NULL: map keys cannot be NULL in Spark
  -- (NULL_MAP_KEY), so a NULL-typed event is excluded from the bag by
  -- contract on BOTH engines
  SELECT user_id, event_type, COUNT(*) AS cnt,
         CAST(SUM(CAST(CASE WHEN isnan(value) OR abs(value) = CAST('Infinity' AS DOUBLE) THEN NULL ELSE value END AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM events WHERE event_type IS NOT NULL
  GROUP BY user_id, event_type
),
per_user AS (SELECT user_id, COUNT(*) AS n_types FROM ent GROUP BY user_id)
SELECT e.user_id,
       e.event_type,
       e.cnt AS n_events,
       e.sum_value / e.cnt AS avg_value,
       p.n_types
FROM ent e JOIN per_user p USING (user_id)
WHERE e.cnt >= {MAP_MIN_EVENTS}
ORDER BY user_id, event_type
""",
    description="MapType write path: per-user event_type→count and"
    " event_type→sum maps built with map_from_entries, merged key-wise"
    " with map_zip_with (per-type average), pruned with map_filter"
    " (frequent types only), then exploded back to rows — the map-HOF"
    " construct/combine/filter surface as one codegen plan",
    tags=("events", "maps", "hof"),
)
def ev_user_type_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle is the relational unrolling of the same semantics
    (maps are an execution representation, not a result type here — the
    exploded rows are what the driver hashes, so map construction,
    key-wise merge, and filtering all sit on the hashed path: drop any
    HOF and the row set changes). The per-entry average follows registry
    determinism rule 3: the sum is an exact decimal cast to double, and
    the quotient is ONE IEEE double op emitted unrounded — bit-identical
    across engines, unlike round(x, 4), which lands half-up (Spark) vs
    half-even (DuckDB) on exact .00005 boundaries."""
    ev = load_table(spark, sf_dir, "events")
    # NULL event_type rows are excluded BEFORE the map build: a NULL
    # map key is an engine error (NULL_MAP_KEY), so the bag's key
    # contract is non-null by construction — mirrored in the oracle
    ev = ev.filter(F.col("event_type").isNotNull())
    ent = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(finite_col(F.col("value")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )
    per_user = ent.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("cnt_map"),
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "sum_value"))
        ).alias("sum_map"),
    )
    merged = per_user.select(
        "user_id",
        F.size("cnt_map").alias("n_types"),
        F.map_zip_with(
            "cnt_map", "sum_map", lambda _k, c, s: s / c
        ).alias("avg_map"),
        F.map_filter(
            "cnt_map", lambda _k, c: c >= F.lit(MAP_MIN_EVENTS)
        ).alias("busy_map"),
    )
    return (
        merged.select(
            "user_id",
            "n_types",
            "avg_map",
            F.explode("busy_map").alias("event_type", "n_events"),
        )
        .select(
            "user_id",
            "event_type",
            "n_events",
            F.element_at("avg_map", F.col("event_type")).alias("avg_value"),
            "n_types",
        )
        .orderBy("user_id", "event_type")
    )
