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
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(_col(c).cast(f"decimal(18,{scale})")).cast("double")


def davg(c: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum, double division by count."""
    return dsum(c, scale) / F.count(_col(c)).cast("double")


def duckdb_dsum(expr: str, scale: int = 4) -> str:
    """The DuckDB twin of :func:`dsum` (identical decimal discipline)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def duckdb_davg(expr: str, scale: int = 6) -> str:
    return f"({duckdb_dsum(expr, scale)} / CAST(COUNT({expr}) AS DOUBLE))"
