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


#: Driver-evidence priority (round 12 rotation, regenerated at round
#: END after the last logic-touching commit): the driver checks a
#: 50-query prefix of this ordering. Steady-state cadence (COVERAGE.md
#: "Rotation cadence"): NOT-GREEN rows first (none), then
#: never-checked (`ev_value_validate`, the non-finite census
#: registered this round), then stale chains oldest evidence first —
#: the chains staled by the r11 dirty/non-finite batches (events.py
#: stat pack, multimodal fakes, streaming twins, vector-audit/LSH
#: families) plus this round's support-parity and NaN-element-gate
#: edits (`sim_ndcg_sq8_eval`, `sim_pq_train` via the shared PQ
#: chain). The remaining stale chains enter the r13 window. 50
#: entries. Regenerate with `python3 tools/rotation_audit.py`, do not
#: hand-maintain.
DRIVER_PRIORITY: tuple[str, ...] = (
    "ev_value_validate",
    "mm_image_resize",
    "mm_phash_neardup",
    "agg_skyline_2d",
    "ev_absorbing_conversion_prob",
    "ev_anomaly_seasonal_zscore",
    "ev_bootstrap_ci",
    "ev_changepoint",
    "ev_cohort_ltv_curve",
    "ev_concurrency_curve",
    "ev_cuped_adjustment",
    "ev_delta_decomposition",
    "ev_did_estimator",
    "ev_entropy_rate",
    "ev_forecast_backtest",
    "ev_growth_accounting",
    "ev_hits_scores",
    "ev_ivm_delta_rollup",
    "ev_markov_stationary",
    "ev_msprt_sequential",
    "ev_ohlc_bars",
    "ev_power_mde",
    "ev_propensity_ipw",
    "ev_ratio_metric_ci",
    "st_enrich_static",
    "st_incremental_rollup",
    "st_lambda_cutover",
    "ev_rolling_median",
    "ev_seasonal_decompose",
    "ev_welch_ttest",
    "ingest_csv_malformed",
    "ingest_orc_roundtrip",
    "mm_scene_cuts",
    "sim_binary_hamming_topk",
    "sim_cascade_rerank",
    "sim_centroid_drift",
    "sim_multiprobe_lsh",
    "sim_ndcg_sq8_eval",
    "sim_pq_train",
    "ta_gains_chart",
    "fileops_list",
    "mm_audio_windows",
    "mm_frame_sample",
    "mm_image_meta",
    "read_range",
    "rollup_sales_by_region",
    "sim_ivf_recall",
    "ta_length_drift",
    "ta_mojibake_detect",
    "ta_quality_auc",
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
