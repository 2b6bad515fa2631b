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


#: Driver-evidence priority (round 13 rotation, re-regenerated at
#: round END after the last logic-touching commit — the NULL-hour
#: window gates, 63f0031): the driver checks a 50-query prefix of
#: this ordering. Steady-state cadence (COVERAGE.md "Rotation
#: cadence"): NOT-GREEN rows first (none), then never-checked (none),
#: then stale chains oldest evidence first — this window takes ALL 45
#: stale chains (the 41 carried from r11/r12 plus the five r13
#: NULL-hour-gate edits: ev_rolling_median, ev_seasonal_decompose,
#: ev_ewma_value, ev_cusum_drift, ev_autocorr — autocorr/cusum were
#: already stale, and ev_value_validate's chain shares the edited
#: module) plus the 5 oldest-evidence fresh rows.
#: NOTE: the window reflects staleness as of its regeneration commit;
#: any later logic-touching commit in the same round can re-stale
#: chains outside it — the round-close full-registry battery
#: (verify_contract + dirty_sweep) covers that gap, and the next
#: round's regeneration picks the chains up. Regenerate with
#: `python3 tools/rotation_audit.py`, do not hand-maintain.
DRIVER_PRIORITY: tuple[str, ...] = (
    "ta_readability_fk",
    "ta_simpson_diversity",
    "ta_weighted_sample_es",
    "tj_interval_union",
    "window_distribution_pack",
    "dd_embedding_neardup",
    "ev_anomaly_zscore",
    "ev_cogrouped_quota",
    "ev_grouped_map_running",
    "ev_hourly_windows",
    "ev_json_extract",
    "ev_salted_hot_key_join",
    "ev_scd2_intervals",
    "ev_theil_sen",
    "ev_top_users_by_value",
    "ev_type_value_stats",
    "ingest_compacted",
    "ingest_roundtrip",
    "rag_mmr_batch",
    "rag_mmr_topk",
    "sim_compression_frontier",
    "sim_graph_greedy_search",
    "sim_ivfpq_topk",
    "sim_kcore_decompose",
    "sim_kmeans_refine",
    "sim_knn_graph",
    "sim_power_iteration_pc1",
    "sim_pq_adc_topk",
    "st_hourly_windows",
    "st_ingest_roundtrip",
    "tpch_q1",
    "tpch_q6",
    "agg_gini_index",
    "agg_pearson_corr",
    "ev_anomaly_mad",
    "ev_autocorr",
    "ev_cusum_drift",
    "ev_ewma_value",
    "ev_trend_forecast",
    "ev_user_type_count_map",
    "ingest_partitioned_scan",
    "ingest_text_formats",
    "ev_rolling_median",
    "ev_seasonal_decompose",
    "ev_value_validate",
    "st_stream_stream_join",
    "ta_mix_temperature",
    "ta_shard_assign",
    "ta_unigram_logprob",
    "ta_vocab_growth",
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
