"""Sketch-aggregation audits — approximate answers with driver-checked
error bounds.

At 100 TB, COUNT(DISTINCT) and exact percentiles are shuffle-heavy;
HyperLogLog++ (`approx_count_distinct`) and t-digest-style quantiles
(`percentile_approx`) are the partial-aggregating, single-pass
replacements. Their estimates are engine-specific, so they cannot be
value-hashed against DuckDB — instead each audit emits the EXACT answer
plus a boolean "estimate within bound" computed on the Spark side, and
the oracle asserts the exact answer with the bound literally true.
A drifting estimate (or a broken sketch) flips the boolean and fails
the driver's hash, so the approximation contract itself is driver
evidence; the numeric tolerance analysis lives in
tests/test_sketches.py. Both sketches are deterministic for fixed data
(hash-based, no RNG), which is what makes the boolean stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

#: HLL++ relative standard deviation; bound checked at 3x rsd.
HLL_RSD = 0.05
HLL_COLS = (
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
)


@register(
    "agg_hll_audit",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name,"
        f" COUNT(DISTINCT {c}) AS exact_distinct,"
        f" TRUE AS approx_in_bound FROM {t}"
        for t, c in HLL_COLS
    )
    + "\nORDER BY col_name",
    description="HyperLogLog++ audit: approx_count_distinct(rsd=0.05)"
    " must land within 3x rsd of the exact distinct count on four key"
    " columns — the estimate-vs-truth contract of the sketch that"
    " replaces COUNT(DISTINCT) at scale, driver-checked via an"
    " exact+boolean row the oracle asserts",
    tags=("agg", "sketch", "approx"),
)
def agg_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partial-aggregating pass per table computes exact and HLL
    side by side (the exact side exists only to judge the sketch; in
    production you run the sketch alone). The boolean is the driver
    evidence: if Spark's HLL++ ever lands outside ±3·rsd on this data,
    the row hash changes."""
    parts = []
    for table, col in HLL_COLS:
        t = load_table(spark, sf_dir, table)
        parts.append(
            t.agg(
                F.lit(col).alias("col_name"),
                F.count_distinct(F.col(col)).alias("exact_distinct"),
                F.approx_count_distinct(F.col(col), HLL_RSD).alias("_approx"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    in_bound = (
        F.abs(
            F.col("_approx").cast("double")
            / F.col("exact_distinct").cast("double")
            - 1.0
        )
        <= 3 * HLL_RSD
    )
    return out.select(
        "col_name", "exact_distinct", in_bound.alias("approx_in_bound")
    ).orderBy("col_name")


#: Percentiles audited and the rank tolerance of the bound.
PCT_PS = (0.5, 0.9, 0.99)
PCT_RANK_TOL = 0.01
PCT_ACCURACY = 10000


@register(
    "agg_percentile_audit",
    oracle="\nUNION ALL\n".join(
        f"SELECT {p} AS p,"
        f" COUNT(*) AS n_rows,"
        f" TRUE AS approx_in_bound FROM lineitem"
        for p in PCT_PS
    )
    + "\nORDER BY p",
    description="approx-percentile audit: percentile_approx must land"
    " between the exact quantiles at p±0.01 (the rank-error contract of"
    " the single-pass sketch that replaces sort-based percentiles at"
    " scale), driver-checked via a count+boolean row the oracle asserts",
    tags=("agg", "sketch", "approx", "percentile"),
)
def agg_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx's guarantee is on RANK, not value: the
    estimate must be some data value whose rank is within ±tol·N of
    p·N. The audit computes exact quantiles at p−tol and p+tol in the
    same pass (exact `percentile` — the expensive judge, fine at audit
    scale) and checks containment; a drifted estimate flips the hashed
    boolean. Exact quantile VALUES are deliberately not hashed — Spark's
    exact percentile interpolates while DuckDB's quantile_disc picks a
    data value, and the audit's contract is the bound, not the
    interpolation convention."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = []
    for p in PCT_PS:
        lo, hi = max(0.0, p - PCT_RANK_TOL), min(1.0, p + PCT_RANK_TOL)
        rows.append(
            li.agg(
                F.lit(p).alias("p"),
                F.count("*").alias("n_rows"),
                F.expr(
                    f"percentile_approx(l_extendedprice, {p}, {PCT_ACCURACY})"
                ).alias("_approx"),
                F.expr(f"percentile(l_extendedprice, {lo})").alias("_lo"),
                F.expr(f"percentile(l_extendedprice, {hi})").alias("_hi"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    in_bound = (F.col("_approx") >= F.col("_lo")) & (
        F.col("_approx") <= F.col("_hi")
    )
    return out.select(
        "p", "n_rows", in_bound.alias("approx_in_bound")
    ).orderBy("p")
