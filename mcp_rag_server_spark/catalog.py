"""Table catalog over the driver-provided parquet fixtures.

Tables (TESTDATA.md / FIXTURES.md): TPC-H-ish star schema plus the
RAG-domain tables (documents / embeddings / events). At 100 TB these
would be partitioned external tables; locally they are single parquet
files, so readers below go straight through the DataFrame reader and
rely on Catalyst for column pruning + predicate pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables that stay constant-size regardless of scale factor (TPC-H
#: region/nation are fixed at 5/25 rows) and are therefore always safe to
#: broadcast-hint. customer/supplier/part scale linearly with SF, so their
#: join strategy is left to AQE + autoBroadcastJoinThreshold at runtime.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Column pruning / filter pushdown happen
    automatically because this is a plain parquet scan.

    The resolved relation is memoized PER SESSION, keyed on the file's
    (path, size, mtime): ``spark.read.parquet`` pays ~100-160 ms of
    driver-side work per call (directory listing + parquet footer
    schema read + relation resolution — r15 measurement), and the
    operator suite re-reads the same handful of fixtures many times
    per query construction. This is METADATA caching only — the exact
    thing a catalog table gives you in production (guide §6: session
    file-listing caches exist precisely to avoid repeated listings of
    an unchanged table) — every action still scans the parquet bytes;
    no row, aggregate, or query result is ever stored. A fixture
    rewritten in place (size or mtime moved) misses the memo and is
    re-resolved, and the memo dies with the session object itself.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    try:
        st = os.stat(path)
        key = (path, st.st_size, st.st_mtime_ns)
    except OSError:
        key = None  # non-local / vanished path: fall through uncached
    cache: dict | None = None
    if key is not None:
        cache = getattr(spark, "_graft_relation_cache", None)
        if cache is None:
            cache = {}
            spark._graft_relation_cache = cache
        hit = cache.get(key)
        if hit is not None:
            return hit
    df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    if cache is not None:
        cache[key] = df
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Make ``events.ts`` a session-tz TIMESTAMP regardless of how the
    fixture vintage encoded it. Two encodings exist across driver
    generations:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so the
      session-level nanosAsLong conf (session.REQUIRED_RUNTIME_CONFS)
      reads it as a BIGINT of nanoseconds; truncate to microseconds with
      integer division — exactly what DuckDB does when it narrows
      TIMESTAMP_NS, so both engines see identical event times.
    - TIMESTAMP(MICROS) without UTC-adjustment: Spark infers
      TIMESTAMP_NTZ; cast to TIMESTAMP (session tz is pinned to UTC, so
      the wall-clock value is unchanged and matches DuckDB's naive
      TIMESTAMP read bit-for-bit).
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so operators can be
    expressed in pure Spark SQL when that is clearer than DataFrame ops."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
