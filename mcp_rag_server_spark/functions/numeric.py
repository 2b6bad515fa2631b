"""Cross-engine deterministic numeric aggregation helpers.

Problem: a plain ``SUM(double)`` is order-dependent; Spark's partial
aggregation over 32 shuffle partitions and DuckDB's sequential scan sum
the same values in different orders, so the low bits differ and a
value-hash comparison fails.

Solution: per-row float math is IEEE-deterministic (same inputs → same
double in every engine), so we cast each row's value to DECIMAL(18,s)
(exact, and a double is never exactly on a decimal rounding midpoint,
so the engines' rounding-mode difference is unobservable) and sum the
decimals — decimal addition is exact and order-independent — then cast
the total back to DOUBLE.

At 100 TB this costs nothing extra: decimal partial aggregation is
still a map-side combine + single shuffle, identical plan shape to a
double sum.

Non-finite contract (round 11): NaN and ±Infinity are EXCLUDED from
the decimal-exact aggregates, on both engines, explicitly. A plain
double SUM is poisoned to NaN by one bad row; the decimal path is
worse — and silently divergent: Spark's double→decimal cast yields
NULL for non-finite values (so they just vanish from the sum) while
DuckDB's CAST *and its try_cast* raise. The finite-gate CASE makes
the exclusion a stated rule instead of an engine accident, and davg's
denominator counts the same finite set so one NaN row cannot dilute a
mean it contributed nothing to.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _finite(c: Column) -> Column:
    """NULL out non-finite doubles (NaN, ±Inf) — the pre-aggregate gate.
    isnan() carries the NaN case; abs(x) = Inf carries ±Inf (NaN = Inf
    is false under Spark's NaN ordering, so the clauses are disjoint).
    Spark has no isfinite(), hence the two-clause form of DuckDB's
    isfinite()."""
    inf = F.expr("CAST('Infinity' AS DOUBLE)")
    return F.when(F.isnan(c) | (F.abs(c) == inf), F.lit(None)).otherwise(c)


#: Public name for the per-row finite gate: operators whose oracle
#: texts gate non-finite values explicitly must state the SAME
#: exclusion on the Spark side instead of riding Spark's silent
#: double→decimal NULL cast for NaN/±Inf (the "engine accident" this
#: module's contract exists to replace).
finite_col = _finite


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column, returned as double.
    Non-finite inputs are excluded (module docstring contract)."""
    return F.sum(_finite(_col(c)).cast(f"decimal(18,{scale})")).cast(
        "double"
    )


def davg(c: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG over the FINITE values: exact decimal sum,
    double division by the matching finite count."""
    return dsum(c, scale) / F.count(_finite(_col(c))).cast("double")


def duckdb_isfinite(expr: str) -> str:
    """DuckDB finite-gate: NULL for NaN/±Inf, else the value."""
    return f"(CASE WHEN isfinite({expr}) THEN {expr} END)"


def duckdb_dsum(expr: str, scale: int = 4) -> str:
    """The DuckDB twin of :func:`dsum` (identical decimal discipline +
    finite gate — DuckDB's decimal CAST errors on non-finite input)."""
    return (
        f"CAST(SUM(CAST({duckdb_isfinite(expr)} AS DECIMAL(18,{scale})))"
        f" AS DOUBLE)"
    )


def duckdb_davg(expr: str, scale: int = 6) -> str:
    return (
        f"({duckdb_dsum(expr, scale)}"
        f" / CAST(COUNT({duckdb_isfinite(expr)}) AS DOUBLE))"
    )
