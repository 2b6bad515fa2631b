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


#: Driver-evidence priority (round 11 rotation, regenerated at round
#: END after the final logic-touching batch): the driver checks a
#: 50-query prefix of this ordering. Steady-state cadence (COVERAGE.md
#: "Rotation cadence"): NOT-GREEN rows first unconditionally
#: (`agg_percentile_audit`, red at r10, fix landed this round), then
#: never-checked (`sim_embedding_validate`, registered this round),
#: then the chains staled by this round's dirty-input + non-finite
#: contract fixes — the sequence/window NULL gates, the
#: valid_embedding-gated vector ops, the finite-gated dsum users
#: (the TPC-H revenue block rides on duckdb_dsum, hence its presence),
#: the corpus-writer path gates — oldest evidence first. 50 entries.
#: Regenerate with `python3 tools/rotation_audit.py`, do not
#: hand-maintain.
DRIVER_PRIORITY: tuple[str, ...] = (
    "agg_percentile_audit",
    "sim_embedding_validate",
    "st_sessionize",
    "st_sliding_windows",
    "st_stateful_user_stats",
    "top_parts_by_revenue",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunctive_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "ev_props_map_stats",
    "ev_user_type_count_map",
    "fileops_list_ext",
    "fileops_read_guard",
    "sim_hyperplane_lsh",
    "sim_ivf_topk",
    "sim_l2_topk",
    "sim_label_centroids",
    "ta_lang_profile",
    "tj_asof_last_order",
    "tpch_q10_returns",
    "tpch_q11_important_stock",
    "tpch_q20_excess_shippers",
    "tpch_q22_global_sales_opportunity",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9_product_profit",
    "agg_conditional_argmax",
    "agg_gini_index",
    "agg_pearson_corr",
    "dd_semdedup",
    "ev_anomaly_mad",
    "ev_attribution_last_touch",
    "ev_autocorr",
    "ev_cusum_drift",
    "ev_ewma_value",
    "ev_gap_fill",
    "ev_hypertable_rollup",
    "ev_ks_test",
    "ev_pagerank_types",
    "ev_pit_features",
    "ev_rfm_segments",
    "ev_seasonal_profile",
    "ev_session_paths",
    "ev_transition_matrix",
    "ev_trend_forecast",
    "ingest_gdpr_delete",
    "ingest_partitioned_scan",
    "ingest_text_formats",
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
