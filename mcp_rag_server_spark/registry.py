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


#: Driver-evidence priority (round 9 rotation): the driver checks a
#: 50-query prefix of this ordering. Round-8 verdict: 280 of 302
#: registry queries have a green driver row; the never-checked
#: backlog is down to 22. Directive #1 = this window closes the
#: backlog for good: the 22 remaining never-checked queries
#: (ta_leakage_safe_split ... zorder_layout, rotation_audit "(a)"
#: order) followed by the 28 oldest stale rows (r3-vintage green
#: rows whose files have since been edited: arrow_token_stats ...
#: ta_pii_scrub). Exactly 50 entries. After the driver scores this
#: window, every registry query has a driver row and rotation
#: becomes pure oldest-evidence re-checks (now query-granular, keyed
#: to each query's own source+oracle hash — see
#: tools/rotation_audit.py). Regenerate with
#: `python3 tools/rotation_audit.py`, do not hand-maintain.
DRIVER_PRIORITY: tuple[str, ...] = (
    "ta_leakage_safe_split",
    "ta_length_drift",
    "ta_logreg_quality",
    "ta_mojibake_detect",
    "ta_ngram_novelty",
    "ta_pmi_collocations",
    "ta_quality_auc",
    "ta_quality_calibration",
    "ta_readability_fk",
    "ta_simpson_diversity",
    "ta_textrank_keywords",
    "ta_trigram_index_search",
    "ta_weighted_sample_es",
    "ta_winnowing_fingerprint",
    "ta_zipf_fit",
    "tj_interval_union",
    "tj_nearest_order",
    "window_distribution_pack",
    "window_range_trailing30",
    "window_running_distinct",
    "window_value_frames",
    "zorder_layout",
    "arrow_token_stats",
    "chunk_split",
    "chunk_split_clamped",
    "chunk_udtf",
    "chunks_table",
    "cube_lineitem_flags",
    "dd_minhash_lsh",
    "dd_simhash",
    "emb_hash_embed",
    "fileops_list",
    "fileops_reassemble_text",
    "ingest_roundtrip",
    "mm_audio_windows",
    "mm_frame_sample",
    "mm_image_meta",
    "rag_hybrid_topk",
    "rag_query_result",
    "read_range",
    "rollup_sales_by_region",
    "set_except_customers",
    "set_intersect_status",
    "sim_ivf_recall",
    "sim_sq8_topk",
    "st_ingest_roundtrip",
    "ta_decontaminate",
    "ta_mixture_cap",
    "ta_pack_sequences",
    "ta_pii_scrub",
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
