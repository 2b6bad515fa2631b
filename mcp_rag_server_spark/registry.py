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


#: Driver-evidence priority (round 5 rotation): the driver checks a
#: 50-query prefix of this ordering, risk-ordered: (a) the two queries
#: that have NEVER had a driver row — ev_props_map_stats and
#: ta_dedup_budget_pipeline landed after round 4's window filled (both
#: deferrals were promised to lead this window; ev_props_map_stats'
#: deferral went unrecorded in the r4 comment, ADVICE r4 item 1 —
#: corrected here); (b) the four queries NEW this round
#: (map-HOF write path, traversal-guard read, UNPIVOT, VARIANT);
#: (c) queries whose BEHAVIOR changed this round: dd_lsh_band_audit's
#: truth sample became an absolute lowest-md5 row cap,
#: ingest_compacted plants a failing-extraction PDF (P4) under an
#: allow-listed pdf ext, and st_latest_state's foreachBatch merge
#: gained the batch_id replay guard + keyed temp dir; (d) every row
#: whose most recent driver check is older than r3 — the r1-vintage
#: window_moving_avg, then all forty r2-vintage rows (the ten ta_*
#: textanalysis and four sim_* rows round 4 evicted rotate back
#: exactly as promised, plus grouping_sets_sales, whose behavior also
#: changed: it now emits GROUPING_ID). Exactly 50 entries; after this
#: round no registry query's latest driver row predates r3.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked — the r4 deferrals lead, as promised
    "ev_props_map_stats",
    "ta_dedup_budget_pipeline",
    # (b) new this round — no driver row exists
    "ev_user_type_count_map",
    "fileops_read_guard",
    "unpivot_lineitem_metrics",
    "ev_props_variant_stats",
    # (c) behavior changed this round
    "dd_lsh_band_audit",
    "ingest_compacted",
    "st_latest_state",
    # (d) rows older than r3, oldest first (rotation_audit ordering);
    # grouping_sets_sales also changed behavior (GROUPING_ID added)
    "window_moving_avg",
    "agg_exact_percentiles",
    "agg_stats_lineitem",
    "agg_string_concat_nations",
    "dd_exact_stats",
    "fileops_list_ext",
    "grouping_sets_sales",
    "pivot_status_by_priority",
    "rag_topk",
    "sim_ann_topk",
    "sim_hyperplane_lsh",
    "sim_ivf_topk",
    "sim_l2_topk",
    "sim_label_centroids",
    "sim_radius_search",
    "sql_rag_topk",
    "ta_bigram_top",
    "ta_filter_pipeline",
    "ta_fingerprint",
    "ta_lang_profile",
    "ta_langid_heuristic",
    "ta_quality_score",
    "ta_repetition_stats",
    "ta_stratified_sample",
    "ta_tfidf_top",
    "ta_token_stats",
    "tj_asof_last_order",
    "tj_range_pairs_5min",
    "tpch_q10_returns",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipment_priority",
    "tpch_q13_order_count_distribution",
    "tpch_q16_supplier_part_count",
    "tpch_q20_excess_shippers",
    "tpch_q21_waiting_orders",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9_product_profit",
    "window_rank_analytics",
)
# The window is exactly the must-check set this round — the two
# never-checked queries, the four new ones, the three whose behavior
# changed, and every row whose latest driver check predates r3 — so
# nothing needed evicting. TWENTY-FOUR queries added after the window filled
# wait for r6, where they lead per the never-checked-first rule:
# dd_incremental_minhash (the asymmetric incoming-vs-existing LSH
# admission pass), rag_rrf_topk (reciprocal-rank fusion),
# rag_bm25_topk (Okapi BM25), ev_gap_fill (timeline densify + ffill),
# ev_transition_matrix (Markov event transitions), dd_substring_runs
# (exact-substring duplicate runs), ta_zipf_fit (decimal-exact Zipf
# regression), sim_pq_train (PQ codebook Lloyd refinement),
# window_range_trailing30 (time-based RANGE frame),
# ingest_partitioned_scan (hive-partitioned write + pruned read),
# ingest_text_formats (JSONL/CSV schema-first round-trip),
# ingest_bucketed_join (co-located bucketBy join, zero join-side
# exchanges), ta_fuzzy_correct (SymSpell deletion-neighborhood
# fuzzy correction), mm_phash_neardup (aHash Hamming-LSH
# near-dup over binary blobs), ev_session_paths (top session
# paths via order-insensitive struct-sorted collection),
# sql_recursive_reach (Spark 4 WITH RECURSIVE min-hop graph
# traversal), and agg_conditional_argmax (count_if/bool_or/
# bool_and/max_by/min_by with total ordering keys),
# ingest_gdpr_delete (dynamic-partition-overwrite erasure),
# sim_filtered_topk (pre-filtered vector search),
# st_enrich_static (stream-static dimension enrichment), and
# ta_admission_pipeline (the 5-stage lang→quality→dedup→PII→
# budget admission chain as one plan), mm_image_resize
# (nearest-neighbor thumbnail through the decode boundary), and
# ev_cep_conversion (strict-adjacent sequence pattern with a
# completion deadline), and ev_hypertable_rollup (minute→hour→day
# continuous-aggregate lattice), plus the second-sitting eleven:
# ev_pagerank_types (unrolled power-iteration PageRank),
# join_bloom_prefilter (bloom semi-join prefilter with FP accounting),
# agg_histogram_equiwidth (equi-width histogram), dd_semdedup
# (cluster-blocked semantic dedup), ev_ewma_value (dyadic-weight
# EWMA), zorder_layout (Morton-interleave multi-dim skipping audit),
# dd_containment (Broder asymmetric containment pairs),
# ev_abtest_ztest (two-proportion z-test on md5-parity arms),
# window_distribution_pack (percent_rank/cume_dist/ntile),
# ta_simpson_diversity (exact Simpson mixture diversity),
# agg_pearson_corr (decimal-exact moments -> Pearson/OLS),
# sim_maxsim_topk (ColBERT-style late-interaction MaxSim),
# sim_binary_hamming_topk (1-bit sign codes, XOR-popcount scan), and
# ev_cusum_drift (CUSUM change detection via the prefix identity),
# set_all_multiplicity (EXCEPT/INTERSECT ALL bag semantics),
# window_value_frames (first/last/nth_value over explicit frames —
# with the shrinking-frame O(n^2) pitfall documented and avoided),
# agg_weighted_median (exact weighted median via decimal prefix
# windows), ingest_schema_evolution (mergeSchema add-a-column
# round-trip), ev_trend_forecast (decimal-exact OLS trend + forecast),
# and ev_attribution_last_touch (last-touch credit via one IGNORE-
# NULLS carry window, never the purchases x clicks range join),
# ta_readability_fk (Flesch-Kincaid grade census), ta_code_detect
# (code-vs-prose filter features), and ta_lang_confusion (the langid
# heuristic's truth x prediction contingency), tj_nearest_order
# (nearest-in-time join via ASC+DESC prefix carries), and
# dd_graph_triangles (triangle census + clustering coefficient over
# the duplicate graph), and st_incremental_rollup (streaming
# continuous aggregate via the generalized exactly-once foreachBatch
# merge), and ta_kl_source_drift (KL(P_source||P_corpus) token-
# distribution drift), ta_bpe_train (distributed BPE merge learning,
# 3 unrolled iterations at vocabulary cost), and rag_context_pack
# (token-budget context assembly via rank + prefix-sum windows),
# ev_pit_features (point-in-time no-leakage training features via a
# 1-PRECEDING RANGE frame), ta_dsir_weights (DSIR importance-
# resampling log weights over add-1 unigram LMs), and agg_gini_index
# (exact rank-formula Gini concentration), sql_lateral_topn
# (correlated LATERAL subquery, decorrelated to a ranked join), and
# ev_survival_km (Kaplan-Meier cohort survival via exp of prefix-
# summed rounded-ln terms), sim_mips_augmented (MIPS via the norm-
# augmentation reduction), and ev_ks_test (two-sample KS from exact
# prefix-count CDFs), ingest_mor_deletes (merge-on-read deletion
# vectors via broadcast anti-join), ev_purchase_streaks (calendar
# gaps-and-islands streak census), and agg_benford_audit (first-digit
# forensics vs log10(1+1/d)), sim_hard_negatives (contrastive
# triplet mining: per-anchor argmax positive + hard negative in one
# role-keyed window), and ingest_time_travel (manifest-driven
# as-of-version reads over immutable files), and
# dd_cluster_aware_sample (Horvitz-Thompson one-per-component
# sampling with cluster-size weights and the mass-conservation
# identity hashed), ev_anomaly_mad (median/MAD robust anomaly
# census), ev_autocorr (lag-1/lag-24 ACF, wide output from one window
# pass), and st_lambda_cutover (batch history + exactly-once streamed
# head merged into one table, hashed against the full-range oracle) —
# agg_table_fingerprint (order-insensitive Merkle-leaf content
# digests for replica verification), and ta_logreg_quality (fixed-
# weight logistic quality scorer — the learned-filter serving shape)
# agg_column_profile (null/zero/distinct/range data profiling), and
# ev_seasonal_profile (hour-of-day provisioning curve + peak flag),
# join_market_basket (A-priori pair stage: co-purchase lift over
# basket-keyed self-join), and ev_rfm_segments (RFM quintile
# segmentation, allowlisted bounded-input global ntiles) — all
# locally oracle-replayed green at sf0.001 AND sf0.01. r6 window
# arithmetic: 75 never-checked queries (the 22 above +
# dd_incremental_minhash + rag_rrf_topk + these 51) plus ~29
# r3-vintage rows total ~104 for 50 slots — the never-checked set
# OVERFILLS the window 2x: r6 takes the 50 oldest-registered
# never-checked, the rest (plus every r3-vintage re-check) slide to
# r7; r6's builder should confirm with tools/rotation_audit.py.
# Separate r6 suggestion: migrating _jaccard_pair_edges to hashed-
# token intersections (the dd_containment optimization, ~2x on the
# whole CC family's ~21 s) changes the hashes of three driver-green
# queries (dd_jaccard_same_source, dd_connected_components,
# dd_keep_canonical, plus dd_graph_triangles) — do it at an r6 window
# boundary where all four get fresh rows, not mid-round. The 49 round-4-green rows (plus the r3-green remainder)
# sit out solely on freshness: many are file-stale through this
# round's edits (dedup.py, relational.py, fileops.py, ingest_query.py,
# cdc_stream.py, files.py import closures), but each has a green row
# from its own round and tests/test_oracle_parity.py replays all of
# them locally against the current fixtures every run.


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
