"""Central query registry.

Every operator the engine claims (SURVEY.md §2 inventory + the
LLM-pipeline extensions) registers here with BOTH:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - an equivalent ANSI-SQL oracle string runnable by DuckDB on the same
    parquet tables (or None for genuinely non-SQL-expressible ops, which
    downgrade to a rows-only check).

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
contract from this registry, and tests/test_oracle_parity.py replays the
driver's comparison (row count + schema + order-insensitive value hash)
for every entry, so a registered query is a *verified* query.

Cross-engine determinism rules enforced by convention here:
  1. every computed column is aliased identically in Spark and SQL;
  2. float aggregates go through DECIMAL(18,4|6) partial sums (exact,
     order-independent) and are cast back to DOUBLE at the end;
  3. per-row float math is IEEE-deterministic and compared as-is;
  4. similarity scores are rounded to 4 decimals (reference
     src/index.ts:271) and the *rounded* value is the sort key;
  5. every query has a total deterministic ORDER BY when limits apply.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            description=description
            or next(iter((fn.__doc__ or "").strip().splitlines()), ""),
            tags=tuple(tags),
            bench=bench,
        )
        return fn

    return deco


#: Driver-evidence priority (round 10 rotation): the driver checks a
#: 50-query prefix of this ordering. Round-9 closed the never-checked
#: backlog — all 302 registry queries have a green driver row — so
#: rotation is now steady-state (the cadence rule is written in
#: COVERAGE.md "Rotation cadence"): stale logic chains first, then
#: oldest driver evidence. This window = the 23 stale logic chains
#: (`tools/rotation_audit.py` list (b): 18 edited during round 9 —
#: the fanout_width threading, the Lloyd cell-probe refinement, the
#: probe cache — plus 5 touched by round 10's own docstring /
#: PRECONDITION additions), followed by the 27 oldest-evidence rows
#: (r3/r4-vintage greens). Exactly 50 entries.
#: Regenerate with `python3 tools/rotation_audit.py`, do not
#: hand-maintain.
DRIVER_PRIORITY: tuple[str, ...] = (
    "agg_percentile_audit",
    "ev_cogrouped_quota",
    "ev_grouped_map_running",
    "ev_scd2_intervals",
    "sim_ivfpq_topk",
    "sim_kmeans_refine",
    "sim_pq_adc_topk",
    "ta_gopher_rules",
    "dd_lsh_band_audit",
    "ev_props_variant_stats",
    "ingest_compacted",
    "ta_fingerprint",
    "dd_containment",
    "dd_embedding_neardup",
    "dd_method_agreement",
    "sim_knn_graph",
    "ev_theil_sen",
    "sim_compression_frontier",
    "sim_graph_greedy_search",
    "sim_kcore_decompose",
    "sim_power_iteration_pc1",
    "ingest_roundtrip",
    "st_ingest_roundtrip",
    "ta_token_budget",
    "tpch_q1",
    "tpch_q4_exists",
    "tpch_q6",
    "window_topn_per_nation",
    "agg_hll_audit",
    "anti_join_idle_customers",
    "correlated_max_price_part",
    "distinct_agg_lineitem",
    "ev_anomaly_zscore",
    "ev_cohort_retention",
    "ev_dedup_by_second",
    "ev_funnel",
    "ev_hourly_windows",
    "ev_json_extract",
    "ev_latest_state",
    "ev_salted_hot_key_join",
    "ev_sessionize",
    "ev_top_users_by_value",
    "ev_type_value_stats",
    "full_outer_order_ship_days",
    "outer_join_order_counts",
    "rag_mmr_batch",
    "rag_mmr_topk",
    "sim_matryoshka_topk",
    "st_dedup_within_watermark",
    "st_hourly_windows",
)
def ordered_registry() -> dict[str, QuerySpec]:
    """Registry re-keyed so DRIVER_PRIORITY names come first (in that
    order), then every remaining query in registration order."""
    reg = load_all()
    out: dict[str, QuerySpec] = {}
    for name in DRIVER_PRIORITY:
        if name in reg:
            out[name] = reg[name]
    for name, spec in reg.items():
        if name not in out:
            out[name] = spec
    return out


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the registry."""
    from mcp_rag_server_spark.operators import (  # noqa: F401
        cdc,
        chunking,
        dataquality,
        clustering,
        dedup,
        embed,
        events,
        fileops,
        graphs,
        ingest_query,
        late_interaction,
        layout,
        maps,
        multimodal,
        python_api,
        quality,
        rag,
        relational,
        relational_tpch2,
        similarity,
        sketches,
        temporal,
        textanalysis,
        training_prep,
        variant,
        vector_audit,
        vector_lsh,
    )
    from mcp_rag_server_spark.streaming import (  # noqa: F401
        cdc_stream,
        events_stream,
        rollup_stream,
        stateful,
    )

    return REGISTRY
