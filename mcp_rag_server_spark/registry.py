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


#: Driver-evidence priority (round 3 rotation): the driver checks a
#: 50-query prefix of this ordering, so the prefix must hold, in risk
#: order: (a) queries NEW this round (no driver row exists at all),
#: (b) queries whose implementation or oracle CHANGED since their last
#: driver check (dd_connected_components was rewritten to star
#: contraction in r2 but only its pre-rewrite r1 row exists; its
#: fixpoint check changed again this round; chunks_table's id
#: assignment was rebuilt on dense_chunk_ids; fileops_list's oracle
#: dirs CTE was generalized), then (c) every query whose most recent
#: row is r1-vintage (the r2 window covered the other 50). Exactly 50
#: entries — nothing trusted falls outside the window. Everything else
#: was driver-green in r2 and is unchanged; tests/test_oracle_parity.py
#: replays all of them locally regardless.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) new this round
    "rag_mmr_topk",
    "rag_mmr_batch",
    "ta_pack_sequences",
    "ta_pii_scrub",
    "dd_lsh_band_audit",
    "ingest_roundtrip",
    "ev_salted_hot_key_join",
    "ev_anomaly_zscore",
    "chunk_split_clamped",
    "fileops_reassemble_text",
    "dd_keep_canonical",
    "ta_decontaminate",
    "ta_mixture_cap",
    "ta_token_budget",
    "rag_hybrid_topk",
    "sim_sq8_topk",
    "sim_ivf_recall",
    "mm_audio_windows",
    "ev_cogrouped_quota",
    "st_ingest_roundtrip",
    # (b) changed since last driver row
    "dd_connected_components",
    "chunks_table",
    "fileops_list",
    "dd_minhash_lsh",
    "chunk_split",
    # (c) r1-vintage rows, registration order
    "read_range",
    "dd_jaccard_same_source",
    "dd_simhash",
    "dd_embedding_neardup",
    "rag_query_result",
    "emb_hash_embed",
    "ev_hourly_windows",
    "ev_json_extract",
    "ev_funnel",
    "ev_top_users_by_value",
    "ev_type_value_stats",
    "ev_grouped_map_running",
    "ev_cohort_retention",
    "mm_image_meta",
    "mm_frame_sample",
    "chunk_udtf",
    "arrow_token_stats",
    "tpch_q1",
    "tpch_q6",
    "tpch_q4_exists",
    "window_topn_per_nation",
    "rollup_sales_by_region",
    "cube_lineitem_flags",
    "set_intersect_status",
    "set_except_customers",
)
# Evicted to stay at 50 — every query with NO driver row at all outranks
# an r1-green re-check (tools/rotation_audit.py computes this ordering).
# Out this round, all r1-green with fresh r2-green same-file siblings:
# window_lag_orders, window_moving_avg (window_rank_analytics r2-green),
# fileops_list_ext (r2-green; the r3 oracle edit touched only
# fileops_list's dirs CTE), and the relational.py block
# anti_join_idle_customers, outer_join_order_counts,
# distinct_agg_lineitem, correlated_max_price_part, top_parts_by_revenue,
# tpch_q7/q8/q14/q15/q17/q18/q19 (eleven same-file TPC-H rows were
# r2-green). All rotate back next round.


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
        dedup,
        embed,
        events,
        fileops,
        ingest_query,
        multimodal,
        python_api,
        quality,
        rag,
        relational,
        relational_tpch2,
        similarity,
        temporal,
        textanalysis,
        training_prep,
        vector_audit,
        vector_lsh,
    )
    from mcp_rag_server_spark.streaming import (  # noqa: F401
        events_stream,
        stateful,
    )

    return REGISTRY
