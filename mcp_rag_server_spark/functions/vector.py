"""Dense-vector column expressions (cosine / dot / norm).

Reference parity: ``Embeddings.cosine`` (reference src/embeddings.ts:77-92)
— epsilon 1e-10, comparison truncated to the shorter vector, empty vector
scores 0. Implemented as pure Spark SQL higher-order functions
(``zip_with`` + ``aggregate``) so the hot path stays inside whole-stage
codegen; no Python is involved per row.

Determinism discipline: all products/sums are computed in float64 with a
left-to-right fold over the array, which is exactly what the DuckDB
oracle SQL does, so scores are bit-identical across engines before the
final 4-decimal rounding (reference src/index.ts:271).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference src/embeddings.ts:4
COSINE_EPSILON = 1e-10


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Float64 dot product of two array<float> columns (left-to-right fold).

    Truncates to the shorter length via ``zip_with`` — which pads with
    NULL on length mismatch, handled by ``coalesce(x*y, 0)`` — matching
    the reference's min-length loop (src/embeddings.ts:82).
    """
    a, b = _col(a), _col(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(
        prods,
        F.lit(0.0),
        lambda acc, v: acc + F.coalesce(v, F.lit(0.0)),
    )


def l2_norm(a: Column | str) -> Column:
    """Float64 L2 norm of an array<float> column."""
    a = _col(a)
    sq = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.sqrt(sq)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Reference-parity cosine similarity (src/embeddings.ts:77-92).

    - empty a or b  -> 0.0
    - lengths differ -> compare up to min length (zip_with truncation)
    - denominator   -> sqrt(na)*sqrt(nb) + 1e-10
    Norms are computed over the *truncated* prefix, like the reference loop.
    """
    a, b = _col(a), _col(b)
    n = F.least(F.size(a), F.size(b))
    ta = F.slice(a, 1, n)
    tb = F.slice(b, 1, n)
    num = dot(ta, tb)
    den = l2_norm(ta) * l2_norm(tb) + F.lit(COSINE_EPSILON)
    return F.when((F.size(a) == 0) | (F.size(b) == 0), F.lit(0.0)).otherwise(num / den)


def cosine_score(a: Column | str, b: Column | str, decimals: int = 4) -> Column:
    """Cosine rounded to ``decimals`` — the reference's result contract
    rounds to 4 (src/index.ts:271). Rounding is also our cross-engine
    determinism boundary: order-by keys use the rounded value."""
    return F.round(cosine(a, b), decimals)


def dot_score(a: Column | str, b: Column | str, decimals: int = 4) -> Column:
    """Rounded dot product — for pre-normalized vectors dot == cosine and
    skips two norm computations per row (the fixture embeddings are
    L2-normalized, FIXTURES.md A1)."""
    return F.round(dot(a, b), decimals)


# --- DuckDB oracle SQL fragments (kept beside the Spark expressions so the
# two implementations evolve together) -------------------------------------


def duckdb_dot(a: str, b: str) -> str:
    """Same float64 left-to-right fold in DuckDB SQL."""
    return (
        f"list_sum(list_transform(range(1, least(len({a}), len({b})) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duckdb_l2_norm(a: str, n: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, {n} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def duckdb_cosine(a: str, b: str) -> str:
    """Reference-parity cosine in DuckDB SQL (min-length truncation,
    epsilon denominator, empty -> 0)."""
    n = f"least(len({a}), len({b}))"
    num = (
        f"list_sum(list_transform(range(1, {n} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    den = f"({duckdb_l2_norm(a, n)} * {duckdb_l2_norm(b, n)} + 1e-10)"
    return (
        f"CASE WHEN len({a}) = 0 OR len({b}) = 0 THEN 0.0 "
        f"ELSE {num} / {den} END"
    )
