"""Approximate-aggregation (sketch) tests — the 100 TB scale path.

Exact count_distinct and exact percentile are fine at fixture scale and
are what the DuckDB-oracle registry queries pin (distinct_agg_lineitem,
agg_exact_percentiles). At 100 TB the scale path is sketches:

  - approx_count_distinct = HyperLogLog++ — fixed-size state,
    map-side combinable, mergeable across partitions;
  - approx_percentile — bounded-error quantile sketch, same shape.

Sketch estimates are engine-specific (Spark's HLL++ differs from
DuckDB's), so these are tolerance tests against the exact value rather
than hash-matched oracle queries: determinism across runs IS guaranteed
(both sketches are order-insensitive merges of per-value states), and
the error bound is part of Spark's contract (HLL++ default rsd = 5%;
approx_percentile accuracy parameter bounds rank error).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mcp_rag_server_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF, "lineitem")


def test_hll_distinct_within_rsd(spark, lineitem):
    """approx_count_distinct must land within the documented 5% relative
    standard deviation of the exact count (checked at 3x rsd)."""
    row = lineitem.agg(
        F.count_distinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.15


def test_hll_is_run_deterministic(spark, lineitem):
    """HLL++ state is a max-merge over per-value hashes — partitioning
    and row order cannot change the estimate."""
    a = lineitem.agg(F.approx_count_distinct("l_suppkey")).collect()[0][0]
    b = (
        lineitem.repartition(7, "l_orderkey")
        .agg(F.approx_count_distinct("l_suppkey"))
        .collect()[0][0]
    )
    assert a == b


def test_hll_tunable_precision(spark, lineitem):
    """Tighter rsd → closer estimate (and bigger sketch): at rsd=0.01
    the 2000-key domain must be essentially exact."""
    row = lineitem.agg(
        F.count_distinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.03


def test_approx_percentile_within_rank_error(spark, lineitem):
    """approx_percentile(accuracy=a) guarantees rank error <= 1/a: with
    n rows, the returned value's rank must be within n/a of the target
    rank for every requested quantile."""
    n = lineitem.count()
    accuracy = 1000
    exact_q, approx_q = lineitem.agg(
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.95))").alias("e"),
        F.expr(
            f"approx_percentile(l_extendedprice, array(0.25, 0.5, 0.95), {accuracy})"
        ).alias("a"),
    ).collect()[0]
    for q, av in zip((0.25, 0.5, 0.95), approx_q):
        rank = lineitem.filter(F.col("l_extendedprice") <= av).count()
        assert abs(rank - q * n) <= n / accuracy + 1, (q, av, rank)


def test_sketches_partial_aggregate(spark, lineitem):
    """The sketch aggregate must plan as partial+final HashAggregate
    (map-side combine) with ONE exchange — the property that makes it
    the 100 TB path."""
    df = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
