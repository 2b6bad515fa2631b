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


#: Driver-evidence priority (round 4 rotation): the driver checks a
#: 50-query prefix of this ordering, risk-ordered: (a) queries NEW this
#: round (no driver row at all — the eleven round-4 operators plus the
#: compacted-store roundtrip); (b) queries whose BEHAVIOR changed this
#: round: dd_lsh_band_audit's truth join is now sampled, the MMR pair
#: stage gained the pool-bound guard, and EVERY events reader goes
#: through the new catalog.normalize_event_ts (the round-4 fixture
#: regeneration changed events.ts from TIMESTAMP(NANOS) to MICROS) —
#: the 18 ev_*/st_* queries that consume it get fresh rows; (c) the
#: stalest remaining rows per tools/rotation_audit.py (the r1-vintage
#: relational.py block, then r2-vintage singles). Exactly 50 entries.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) new this round — no driver row exists
    "ta_gopher_rules",
    "ta_unigram_logprob",
    "ta_mix_temperature",
    "ta_shard_assign",
    "ta_vocab_growth",
    "ev_latest_state",
    "ev_scd2_intervals",
    "sim_matryoshka_topk",
    "sim_pq_adc_topk",
    "st_latest_state",
    "ingest_compacted",
    "full_outer_order_ship_days",
    "sim_kmeans_refine",
    "agg_hll_audit",
    "agg_percentile_audit",
    "sim_ivfpq_topk",
    # (b) behavior changed this round
    "dd_lsh_band_audit",
    "rag_mmr_topk",
    "rag_mmr_batch",
    "ev_hourly_windows",
    "ev_json_extract",
    "ev_funnel",
    "ev_top_users_by_value",
    "ev_type_value_stats",
    "ev_grouped_map_running",
    "ev_cohort_retention",
    "ev_sessionize",
    "ev_dedup_by_second",
    "ev_salted_hot_key_join",
    "ev_anomaly_zscore",
    "ev_cogrouped_quota",
    "st_hourly_windows",
    "st_sliding_windows",
    "st_sessionize",
    "st_stream_stream_join",
    "st_dedup_within_watermark",
    "st_stateful_user_stats",
    # (c) stalest remaining rows (rotation_audit ordering)
    "anti_join_idle_customers",
    "correlated_max_price_part",
    "distinct_agg_lineitem",
    "outer_join_order_counts",
    "top_parts_by_revenue",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "window_lag_orders",
)
# Five stale re-checks yield slots to new round-4 queries (rule: a
# query with NO driver row outranks any stale re-check): rag_topk is
# smoke-driven by entry() every round at sf0.001 and sim_ann_topk
# shares topk_by_vector scoring with it; dd_exact_stats and
# fileops_list_ext are unchanged since r1/r2 with r3-green same-file
# siblings and are stale only through the catalog.py import closure;
# window_moving_avg shares relational.py's window pack with
# window_lag_orders, which stays in. All remain locally replayed
# against the new fixtures. ta_dedup_budget_pipeline (added after the
# window filled) deliberately waits for the r5 window rather than
# evicting another r1-vintage relational re-check — composition of two
# driver-green operators, verified locally this round.
# Evicted to stay at 50 (rationale, in rotation_audit's stale order):
# the r2-vintage sim_ivf_topk/sim_l2_topk/sim_label_centroids/
# sim_radius_search rows sit beside the r3-green sim_sq8_topk/
# sim_ivf_recall (same file, fresh evidence of the shared helpers) and
# behind the brand-new sim_matryoshka_topk/sim_pq_adc_topk; the ten
# r2-vintage ta_* textanalysis rows (bigram/filter_pipeline/fingerprint/
# lang_profile/langid/quality_score/repetition_stats/stratified_sample/
# tfidf/token_stats) have r3-green same-file siblings
# (ta_decontaminate/ta_mixture_cap/ta_token_budget) and unchanged code;
# dd_* r3-green rows (connected_components, minhash_lsh, ...) are only
# file-stale via the band-audit edit, which itself leads window (b).
# All rotate back next round; tests/test_oracle_parity.py replays every
# registry query locally against the NEW fixtures regardless, green.


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
        clustering,
        dedup,
        embed,
        events,
        fileops,
        ingest_query,
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
        vector_audit,
        vector_lsh,
    )
    from mcp_rag_server_spark.streaming import (  # noqa: F401
        cdc_stream,
        events_stream,
        stateful,
    )

    return REGISTRY
