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
    automatically because this is a plain parquet scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        df = spark.read.parquet(table_path(sf_dir, name))
        return normalize_event_ts(df)
    return spark.read.parquet(table_path(sf_dir, name))


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
