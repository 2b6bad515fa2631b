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


#: Driver-evidence priority (round 8 rotation): the driver checks a
#: 50-query prefix of this ordering. Round-7 verdict: 72 of 302
#: registered queries have no driver row (cumulative 230 distinct
#: green); directive = keep the whole window on the backlog and keep
#: the registration FREEZE until it clears. This window = the 50
#: first never-driver-checked queries in tools/rotation_audit.py
#: order (its "(a) NO driver row" section, verbatim:
#: ev_rolling_median … ta_lang_confusion). Exactly 50 entries. The
#: remaining 22 never-checked queries (ta_leakage_safe_split …
#: zorder_layout) are the r9 window, after which rotation returns to
#: oldest-vintage re-checks and registration may resume — regenerate
#: the list with `python3 tools/rotation_audit.py`, do not
#: hand-maintain it here.
DRIVER_PRIORITY: tuple[str, ...] = (
    "ev_rolling_median",
    "ev_seasonal_decompose",
    "ev_seq_pattern_support",
    "ev_slo_burn_rate",
    "ev_stickiness_ratio",
    "ev_theil_sen",
    "ev_user_overlap_jaccard",
    "ev_welch_ttest",
    "fileops_du_rollup",
    "ingest_compaction_plan",
    "ingest_csv_malformed",
    "ingest_orc_roundtrip",
    "ingest_snapshot_diff",
    "mm_scene_cuts",
    "rag_multi_query_fusion",
    "rag_parent_doc_topk",
    "set_all_multiplicity",
    "sim_binary_hamming_topk",
    "sim_cascade_rerank",
    "sim_centroid_drift",
    "sim_compression_frontier",
    "sim_filtered_topk",
    "sim_graph_greedy_search",
    "sim_hard_negatives",
    "sim_kcore_decompose",
    "sim_maxsim_topk",
    "sim_mips_augmented",
    "sim_multiprobe_lsh",
    "sim_ndcg_sq8_eval",
    "sim_power_iteration_pc1",
    "sim_pq_train",
    "sim_random_projection_jl",
    "sql_lateral_topn",
    "sql_recursive_reach",
    "ta_admission_pipeline",
    "ta_bigram_logprob",
    "ta_bpe_apply",
    "ta_bpe_train",
    "ta_ccnet_buckets",
    "ta_code_detect",
    "ta_dataset_card",
    "ta_doremi_step",
    "ta_dsir_weights",
    "ta_feature_hashing",
    "ta_fuzzy_correct",
    "ta_gains_chart",
    "ta_kanonymity_audit",
    "ta_kl_source_drift",
    "ta_kneser_ney_bigram",
    "ta_lang_confusion",
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
