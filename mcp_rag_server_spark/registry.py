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


#: Driver-evidence priority (round 6 rotation): the driver checks a
#: 50-query prefix of this ordering. This window = (a) the THREE
#: driver-green queries whose hashes changed this round — the whole
#: CC family now builds its edge list from LSH-bucketed candidates
#: (dedup.py _jaccard_pair_edges rewrite, the r5 verdict's top item),
#: so dd_jaccard_same_source / dd_connected_components /
#: dd_keep_canonical need fresh rows (dd_cluster_aware_sample and
#: dd_graph_triangles inherit the same change and are already in (b));
#: join_market_basket (basket-skew cap + drop accounting added),
#: ev_rfm_segments (dead m_score window dropped), agg_table_fingerprint
#: (NULL canonicalization), ev_cusum_drift / agg_gini_index (decimal
#: widening) and ev_ks_test (double-cast critical value) also changed
#: this round and are all in (b) already; then (b) 47 of the 50
#: OLDEST-REGISTERED never-driver-checked queries per
#: tools/rotation_audit.py. Exactly 50 entries.
DRIVER_PRIORITY: tuple[str, ...] = (
    "dd_jaccard_same_source",
    "dd_connected_components",
    "dd_keep_canonical",
    "agg_benford_audit",
    "agg_column_profile",
    "agg_conditional_argmax",
    "agg_gini_index",
    "agg_histogram_equiwidth",
    "agg_pearson_corr",
    "agg_table_fingerprint",
    "agg_weighted_median",
    "dd_cluster_aware_sample",
    "dd_containment",
    "dd_graph_triangles",
    "dd_incremental_minhash",
    "dd_semdedup",
    "dd_substring_runs",
    "ev_abtest_ztest",
    "ev_anomaly_mad",
    "ev_attribution_last_touch",
    "ev_autocorr",
    "ev_cep_conversion",
    "ev_cusum_drift",
    "ev_ewma_value",
    "ev_gap_fill",
    "ev_hypertable_rollup",
    "ev_ks_test",
    "ev_pagerank_types",
    "ev_pit_features",
    "ev_purchase_streaks",
    "ev_rfm_segments",
    "ev_seasonal_profile",
    "ev_session_paths",
    "ev_survival_km",
    "ev_transition_matrix",
    "ev_trend_forecast",
    "ingest_bucketed_join",
    "ingest_gdpr_delete",
    "ingest_mor_deletes",
    "ingest_partitioned_scan",
    "ingest_schema_evolution",
    "ingest_text_formats",
    "ingest_time_travel",
    "join_bloom_prefilter",
    "join_market_basket",
    "mm_image_resize",
    "mm_phash_neardup",
    "rag_bm25_topk",
    "rag_context_pack",
    "rag_rrf_topk",
)
# r7 plan: the remaining never-checked queries (the 3 displaced by the
# CC-family re-checks — set_all_multiplicity, sim_binary_hamming_topk,
# sim_filtered_topk — the four registered mid-r6 after this window was
# fixed: dd_soft_dedup_weights (1/cluster-size down-weighting with the
# mass-conservation identity hashed), dd_cross_source_matrix
# (cross-source near-dup provenance census over the shared LSH
# buckets), agg_kmv_distinct_audit (KMV sketches: the set-INTERSECTION
# estimates HLL cannot provide, exact answers beside them), and
# ta_quality_calibration (model-score vs Gopher-rule reliability
# table, fixed-width buckets so nothing is global),
# dd_minhash_est_audit (signature-agreement Jaccard estimate vs exact
# shingle truth on every banded candidate — the sketch calibration
# check), agg_cm_sketch_audit (count-min heavy-hitter audit: d x w
# counter table, never-underestimates guarantee hashed),
# ev_welch_ttest (unequal-variance mean test with Welch-Satterthwaite
# df beside the z/KS tests), and ta_winnowing_fingerprint (MOSS
# winnowing: per-window k-gram hash minima with packed-position
# tie-break, per-doc fingerprint-set digest), ingest_orc_roundtrip
# (ORC write/read-back with pushdown, hashed against the
# parquet-derived oracle), sim_knn_graph (k-NN neighborhood graph:
# label-blocked half-matrix scored once + mirrored, per-vector rank),
# and ta_bigram_logprob (add-1-smoothed bigram-LM surprisal and
# perplexity per doc — the conditional tier above the unigram proxy),
# st_kmv_sketch (KMV sketch maintained as streaming state via the
# exactly-once merge — mergeability makes the streamed sketch equal
# the batch-built one), ev_mutual_information (exact MI + chi-square
# between event_type and hour from one contingency pass), and
# ta_ngram_novelty (per-source shingle exclusivity / spread census),
# tj_interval_union (merge-overlapping-intervals coverage islands via
# a prefix-max window, never an overlap join), ev_entropy_rate
# (per-state Markov transition entropy/perplexity), and
# ta_weighted_sample_es (Efraimidis-Spirakis weighted top-k sampling
# with the md5 fold as the uniform draw — RNG-free),
# ingest_csv_malformed (PERMISSIVE corrupt-record quarantine with the
# exact bad-row count hashed), ev_did_estimator
# (difference-in-differences over md5 arms x hour-aligned pre/post
# with large-sample SE), and sim_centroid_drift (even/odd-half
# centroid cosine per label — the retrain-the-quantizer staleness
# audit), ev_bot_heuristics (rate + inter-arrival-regularity bot
# flags from one lag window, bounded 2x2 census),
# dd_cluster_size_hist (near-dup severity histogram with the
# keep-one-drop identity hashed against dd_keep_canonical), and
# ta_length_drift (leave-one-out two-sample KS of each source's
# length distribution vs the rest — the allowlisted bounded-global
# prefix runs over distinct lengths only), ev_power_mde (MDE /
# required-sample-size experiment planning from the moment pass),
# ev_rolling_median (trailing-24h exact rolling median with
# spike/dip census — bounded ROWS frame), and
# rag_multi_query_fusion (query-expansion RRF over three variant
# vectors: broadcast variants x one corpus scan), and
# agg_ols_sufficient_stats (multivariate OLS solved closed-form
# from one decimal-exact moment pass — cross-checked against numpy
# lstsq in test_reference_semantics, which caught a det2 cofactor
# bug the cross-engine hash could not), ev_changepoint
# (binary-segmentation level-shift detection: between-segment SS via
# prefix sums, one window pass instead of O(n²) re-aggregation),
# ev_theil_sen (robust trend: exact median of all pairwise hourly
# slopes — calendar-bounded pairs — beside the OLS slope), and
# ev_forecast_backtest (holdout forecast evaluation: OLS-trend MAE
# vs persistence baseline, skill score, MAPE), dd_threshold_sweep
# (the dedup-rate curve at Jaccard 0.90/0.95/1.0 from ONE candidate
# verification pass — the threshold-tuning readout), and
# sim_cascade_rerank (binary-Hamming prefilter -> exact-cosine rerank
# cascade with the brute-force recall audit hashed per row),
# ta_kanonymity_audit (k<5 re-identification census over
# (source, lang, length-bucket) quasi-identifiers at three
# generalization levels from one GROUPING SETS pass),
# ta_mojibake_detect (encoding-hygiene census — U+FFFD / C0 control /
# Latin-1 double-encoding detectors over a deterministically
# corruption-injected corpus), and ta_trigram_index_search (pg_trgm
# substring-search plan: trigram inverted-index candidates vs exact
# instr truth with the n_missed = 0 guarantee hashed), ev_hits_scores
# (HITS hubs/authorities: two unrolled mutual-reinforcement rounds,
# L1-normalized, per-half-step localCheckpoint against the 2^k lazy
# blowup), and dd_graph_degree_stats (degree census + Newman
# assortativity of the near-dup graph from decimal-exact endpoint
# moments over the LSH-bounded edge list), agg_mode_per_group (exact
# mode + runner-up + modal share with the count-DESC/value-ASC tie
# policy spelled out — native mode() tie-breaks differ per engine),
# and agg_skew_kurtosis (population 3rd/4th moments from one
# decimal-exact power-sum pass — built-in skewness/kurtosis disagree
# on bias correction across engines), ev_ratio_metric_ci
# (delta-method CI for value-per-event with USER-level clustering +
# the design effect vs the naive iid SE), agg_winsorized_mean
# (5/95-winsorized and 90%-trimmed robust means from one
# array-percentile pass), and ev_funnel_time_quantiles (p50/p90/mean
# time-to-convert per funnel step pair from first-touch conditional
# min-aggs), mm_scene_cuts (video scene-cut census via narrow Arrow
# mapInPandas frame-energy deltas, dyadic-exact vs the SQL twin, with
# the half-away-rounding trap documented), and dd_url_canonicalize
# (crawl URL canonicalization: host case / utm / fragment / slash
# variants planted deterministically and merged, per-source dedup
# rate), sim_power_iteration_pc1 (top principal component via three
# power iterations on a sample-bounded decimal-exact covariance —
# numpy replays the identical iterations in test_reference_semantics),
# and st_heavy_hitters (streaming top-3-per-type leaderboard
# maintained by the exactly-once key-wise count merge),
# ev_seasonal_decompose (STL-lite trend/seasonal/residual split with
# Hyndman strength scores), ev_cohort_ltv_curve (payer-cohort
# cumulative-LTV curve at day cutoffs — stack() unpivot, one fact
# scan), and ev_anomaly_seasonal_zscore (hour-of-day-conditioned
# anomaly census with the only-seasonal-caught delta hashed),
# ingest_snapshot_diff (three manifest commits — base / append /
# manifest-level delete — diffed as-of-version by anti/semi joins:
# the lakehouse table_changes() primitive), and
# sim_random_projection_jl (Johnson-Lindenstrauss 64→16 ±1
# projection with the pairwise distance-distortion audit over a
# bounded sample — mean ratio ~0.99, share-in-band hashed),
# window_running_distinct (running COUNT(DISTINCT) via the
# first-occurrence-flag + prefix-sum rewrite, read as the
# time-to-k-types milestone curve), ev_user_overlap_jaccard
# (audience-overlap matrix: exact per-type-pair Jaccard /
# containment from a user-keyed incidence self-join), and
# dd_minhash_bbit_audit (Li-König b=1-bit minhash estimator vs the
# full-signature agreement per banded candidate pair),
# ev_absorbing_conversion_prob (absorbing-Markov within-k conversion
# odds via unrolled backward induction over checkpointed edges), and
# ev_bootstrap_ci (deterministic Poisson bootstrap: md5-quantized
# Poisson(1) weights, 16 resamples, SE + normal CI),
# ta_leakage_safe_split (train/test split hashed on the near-dup
# COMPONENT id — zero cross-split duplicate edges hashed as proof,
# naive doc-hash leak count as the counterfactual), and
# sim_multiprobe_lsh (Lv et al. multi-probe: home/Hamming-1/
# Hamming-2 probe tiers with candidates + recall@5 per tier),
# sim_graph_greedy_search (the HNSW/DiskANN search layer: unrolled
# greedy beam search over a global degree-6 k-NN graph, per-hop
# visited/recall@5 convergence curve hashed), and
# ev_ivm_delta_rollup (incremental view maintenance: signed
# count/sum rollup maintained from base state + delta batch only,
# drop-on-zero deletion, merged-equals-recompute identity hashed),
# ta_bpe_apply (corpus encoding as a word→encoding dictionary join
# over the trained merge chain — per-source fertility + compression
# hashed), and ev_cuped_adjustment (CUPED variance reduction: theta
# from one exact-moment pass, raw vs adjusted estimates and the
# realized variance-reduction pct hashed), ta_quality_auc (exact
# histogram-AUC of the logistic scorer vs the Gopher labels — one
# bounded window over the ≤1001-row score-bucket table), and
# ev_msprt_sequential (always-valid mixture-SPRT monitoring: per-day
# cumulative moments, log-lambda, anytime p — the peek-safe curve),
# ta_ccnet_buckets (CCNet lang × perplexity-tier composition table
# on fixed surprisal cutoffs — the multilingual mix-planning table),
# sim_kcore_decompose (iterative k-core peeling of the global
# k-NN graph, per-round node/edge collapse census),
# ev_markov_stationary (stationary distribution of the event-type
# chain via 8 unrolled decimal-exact power-iteration steps with the
# final L1 step hashed as the convergence certificate), and
# agg_join_cardinality_audit (CBO uniform-ndv join-size estimate vs
# the exact Σ cA·cB cardinality — err_ratio 1.0 on FK joins, ~1.10
# on the dispersion-bearing self-join), ev_concurrency_curve (peak
# concurrent sessions per day via the two-level sweep line —
# day-partitioned local prefix + calendar-bounded offset prefix,
# cross-checked against a direct global Python sweep), and
# ta_pmi_collocations (PMI-ranked bigram collocations with
# positional marginals, top-20 by rounded PMI via TakeOrdered),
# ta_textrank_keywords (weighted PageRank over the co-occurrence
# graph, graphs.py's round-9 decimal discipline, numpy
# cross-checked), and ingest_compaction_plan (per-source
# sorted-greedy prefix-sum bin packing of the file manifest against
# a soft target — the lakehouse OPTIMIZE planner),
# dq_expectations_audit (Great-Expectations-style gate battery:
# seven exact checks with violation counts hashed, one legitimately
# failing frequency cap), and ev_slo_burn_rate (SRE multi-window
# burn-rate monitor: hourly + 6h trailing RANGE-frame burn vs error
# budget, per-day max burns and fast-AND-slow alert hours hashed),
# rag_parent_doc_topk (parent-document / small-to-big retrieval:
# chunk-level scoring aggregated to parent docs — argmax chunk +
# match census in one doc-keyed reduce, TakeOrdered parents), and
# ta_dataset_card (the one-row corpus datasheet composing the
# token/surprisal/Gopher/near-dup/tier building blocks in one
# statement), ev_delta_decomposition (per-segment period-over-period
# volume/rate/interaction effects with the sums-to-delta identity
# hashed; pandas cross-checked), and ta_doremi_step (DoReMi-lite
# multiplicative-weights domain reweighting from per-source excess
# surprisal; numpy cross-checked), ev_growth_accounting (daily
# new/retained/resurrected/churn-next ledger from user-partitioned
# active-day adjacency — daily grain probed non-degenerate, Python
# set-ledger cross-checked), and ta_feature_hashing (hashing-trick
# width sweep: dims-used + mean per-doc collision rate at 8/16/32
# dims from one shared token scan), ev_propensity_ipw
# (observational ATE via clipped Hajek-normalized inverse-propensity
# weighting over a probed self-selected treatment, ESS diagnostic;
# Python cross-checked), and ta_kneser_ney_bigram (interpolated
# Kneser-Ney bigram LM per-doc surprisal/perplexity beside the add-1
# baseline; Python Counter cross-checked), ev_seq_pattern_support
# (length-2 PrefixSpan support census over FIRST occurrences —
# exists-before probed degenerate and rejected), and
# sim_ndcg_sq8_eval (nDCG@10 of the SQ8 ranker judged by exact
# cosine gains; discount literals, no runtime transcendental),
# dd_method_agreement (three dedup pair sets — LSH-verified,
# SimHash-16 Hamming≤2 via 137-mask expansion, byte-exact — sizes/
# intersections/pair-Jaccard from one tag-union aggregation), and
# sim_compression_frontier (the quantization ladder's bytes-vs-
# recall table: float32/SQ8/JL-16/1-bit ranked against exact top-5
# in one statement), ev_stickiness_ratio (purchase-scoped DAU over
# trailing-3-day AU via the bounded-explode rolling distinct —
# action/width probed against saturation), and ta_gains_chart
# (cumulative gains/lift at ten selection depths over the bounded
# score-bucket table), fileops_du_rollup (du -s over the doc-derived
# catalog tree via the depth-bounded ancestor explode), and
# ev_ohlc_bars (hourly open/high/low/close candlesticks — rank-1
# open/close under the (ts, event_id) total order), and
# agg_skyline_2d (the 2-D Pareto frontier via per-price collapse +
# one domain-bounded prefix-max — never the quadratic dominance
# join; brute-force cross-checked), ev_conversion_window_sensitivity
# (first-signup→purchase conversion at a 1h/6h/1d/7d window grid —
# the metric's derivative wrt the attribution window), and
# ev_interpurchase_burstiness (inter-purchase gap mean/sd/CV +
# exact threshold rungs; CV probed 1.022, honestly Poisson-like) —
# all ninety-three locally
# oracle-replayed green at sf0.001 AND sf0.01 — plus the ~25 the
# 50-slot window could not take:
# sim_hard_negatives, sim_maxsim_topk, sim_mips_augmented, sim_pq_train,
# sql_lateral_topn, sql_recursive_reach, st_enrich_static,
# st_incremental_rollup, st_lambda_cutover, ta_admission_pipeline,
# ta_bpe_train, ta_code_detect, ta_dsir_weights, ta_fuzzy_correct,
# ta_kl_source_drift, ta_lang_confusion, ta_logreg_quality,
# ta_readability_fk, ta_simpson_diversity, ta_zipf_fit, tj_nearest_order,
# window_distribution_pack, window_range_trailing30, window_value_frames,
# zorder_layout) lead r7, then the oldest (r3-vintage) re-checks fill the
# rest — confirm with tools/rotation_audit.py at the r7 boundary. After
# the fourth r6 sitting the registry holds 300 queries and the
# never-driver-checked backlog is 166 (rotation_audit), of which ~47
# clear when the driver scores THIS round's window; the burn-down plan
# is unchanged — each future window takes the 50 oldest-registered
# never-checked first. Every registry query, windowed or not, is
# replayed locally against the DuckDB oracle at sf0.01 by
# tests/test_oracle_parity.py on every pytest run, and closed-form
# statistics additionally carry independent-algorithm cross-checks in
# tests/test_scale_patterns.py.


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
