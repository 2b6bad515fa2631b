"""SparkSession factory with scale-oriented defaults.

The reference engine is a single-threaded JS event loop with zero
partitioning (reference src/indexer.ts:22, src/index.ts:21); this module
is where the new engine's execution model diverges deliberately: AQE,
Arrow, broadcast-join thresholds and sane shuffle partitioning are set
once so every operator inherits them.

Session cache contract: operators ``cache()`` a handful of bounded
intermediates and never unpersist them (they return lazy DataFrames,
so the cache must outlive the function); CacheManager analyzed-plan
dedup keeps the entry set bounded across re-invocation and sharing,
``spark.catalog.clearCache()`` reclaims everything between workloads,
and correctness never depends on a cache being present. Pinned by
tests/test_cache_lifecycle.py, where the contract is spelled out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Shuffle partitions default. On the test rig we size to the CPU count;
#: on a real cluster this is overridden (rule of thumb: 2-3x total cores,
#: or rely on AQE coalescing from a higher initial number).
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Runtime SQL confs every operator assumes. Set at build time by
#: :func:`get_spark`, and re-assertable on a *foreign* session (the
#: correctness driver constructs its own SparkSession and passes it in)
#: via :func:`ensure_session_confs`. This is the ONLY place session conf
#: is mutated — operators and the catalog never call ``spark.conf.set``.
REQUIRED_RUNTIME_CONFS: dict[str, str] = {
    # Legacy fixture vintages carry events.ts as TIMESTAMP(NANOS), which
    # Spark's vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]);
    # this reads the nanos as long so catalog.normalize_event_ts can
    # truncate to micros — exactly what DuckDB does when narrowing
    # TIMESTAMP_NS. Harmless no-op on MICROS-encoded vintages.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Timestamp semantics must be engine-independent vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Idempotently apply :data:`REQUIRED_RUNTIME_CONFS` to a session we
    did not build (no-op on sessions from :func:`get_spark`)."""
    for k, v in REQUIRED_RUNTIME_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def fanout_width(spark: SparkSession, floor: int = 8) -> int:
    """Fan-out width for explicit de-collapse ``repartition()`` hints.

    A handful of operators re-spread a stage whose upstream partitioning
    Catalyst/AQE would otherwise collapse to one task (single-row-group
    fixture scans, global limits, same-key repartition elimination — see
    BENCH_NOTES r8). Those hints must scale with the cluster, not carry a
    fixture-tuned literal: this derives the width from
    ``sc.defaultParallelism`` (= total executor cores on a real cluster,
    = N on ``local[N]``), floored so a tiny local session still spreads
    skew-prone folds. Partition COUNT never affects values — every
    caller does per-row math downstream — so correctness hashes are
    width-independent by construction.
    """
    return max(int(spark.sparkContext.defaultParallelism), floor)


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive de-collapse of a scan whose FILE LAYOUT yields
    fewer tasks than the cluster has cores (optimization guide §2.5
    "input skew": one huge unsplittable file → repartition immediately
    after the read).

    The comparison fixtures are single-file single-row-group parquet
    (BASELINE.md caveat), so EVERY scan is one task and everything
    pipelined on top of it — explodes, md5 folds, decimal partial
    aggregates — runs serially no matter the core count. A production
    layout has many splits and gets that parallelism for free; this
    helper only restores it where the layout denies it, and is a no-op
    whenever the scan already fans out to >= the cluster width:

      - partition deficit is MEASURED from the scan's own RDD layout,
        never assumed (``df.rdd.getNumPartitions()`` is file-split
        math, no job runs);
      - the re-spread is a deterministic HASH repartition on caller-
        chosen high-cardinality ``keys`` — never round-robin, so no
        sort-before-repartition pass and no SPARK-38388 retry hazard;
      - width comes from :func:`fanout_width` (cluster-derived), and
        the explicit numPartitions pins it against AQE re-coalescing
        the tiny fixture shuffle back to one task (the r8 finding on
        ENSURE_REQUIREMENTS exchanges);
      - keyed on the downstream window/groupBy key where one exists,
        the added exchange REPLACES the one EnsureRequirements would
        insert later (same total shuffle count, but it now carries the
        narrow pre-explode rows and everything above it parallelizes).

    Values are partition-independent by the registry's determinism
    rules (per-row math, order-free aggregates), so results are
    bit-identical with and without the spread.
    """
    spark = df.sparkSession
    width = fanout_width(spark)
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width, *keys)


def get_spark(
    app_name: str = "mcp-rag-server-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession used by every operator.

    Scale notes (100 TB design):
      - AQE on: runtime coalescing of shuffle partitions, skew-join
        splitting, and dynamic join-strategy switching.
      - Arrow on: all pandas_udf boundaries (embedding, PDF extract,
        multimodal decode) move data in columnar batches, not rows.
      - Broadcast threshold raised: dimension tables (region/nation/
        supplier at TPC-H shape) must broadcast, never shuffle.
      - Session timezone pinned to UTC so timestamp semantics are
        engine-independent (parquet NTZ data compares bit-equal against
        the DuckDB oracle).
    """
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in REQUIRED_RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
