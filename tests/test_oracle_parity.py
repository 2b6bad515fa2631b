"""Replays the driver's correctness gate for EVERY registered query:
row count + column-name set + order-insensitive value comparison between
the Spark DataFrame and the DuckDB oracle SQL at sf0.01.

Strictness: values must match exactly after canonicalization (floats via
repr of float64). The engine's cross-engine determinism rules
(registry.py docstring) are designed to make that achievable, so any
mismatch here is a real bug in a query pair.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from mcp_rag_server_spark.registry import load_all

from conftest import SF001


def canon_value(v):
    # normalize numpy/pandas scalars from fetchdf to Python types; dtype
    # promotions (int64→float64 etc.) survive .item() and stay visible.
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, Decimal):
        # DO NOT collapse to float: the driver's hash canonicalizes at
        # the string level, so Decimal('0.50') != 0.5 there even though
        # float(Decimal('0.50')) == 0.5. Collapsing here is exactly the
        # blind spot that let the r8 decimal(2,2) regression ship as
        # "hash identical" (caught red by the r10 driver). Keep the
        # replica at-least-as-strict: str() preserves scale.
        return "s:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # collapse -0.0 / 0.0 and use repr of the float64 value
        return f"f:{v + 0.0!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return "s:" + str(v)


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append("|".join(canon_value(row[i]) for i in order))
    return sorted(out)


def all_query_names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, spark, duck):
    spec = load_all()[name]
    sdf = spec.spark_fn(spark, SF001)
    # Both sides go through pandas, exactly like the external driver:
    # e.g. a nullable BIGINT window column is float64 on BOTH sides then
    # (they match), while a dtype divergence only one engine produces
    # (DuckDB HUGEINT from a bare integer SUM) stays visible.
    spdf = sdf.toPandas()
    scols = list(spdf.columns)
    srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]

    if spec.oracle is None:
        # driver's weaker rows-only check
        assert len(srows) >= 0
        return

    # Fetch through pandas, exactly like the external driver: DuckDB
    # HUGEINT (e.g. bare SUM(integer)) lands as float64 there, so an
    # oracle that forgets CAST(... AS BIGINT) fails HERE, not only in
    # the driver's hash check (r01 lesson: fetchall() converts HUGEINT
    # to Python int and silently masked three such mismatches).
    ddf = duck.execute(spec.oracle).fetchdf()
    dcols = list(ddf.columns)
    drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    sc = canon_rows(scols, srows)
    dc = canon_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert sc == dc, (
        f"{name}: value mismatch ({len(mismatches)} rows); first 3: "
        f"{mismatches[:3]}"
    )


def test_canon_value_is_driver_strict_on_decimal():
    """Regression pin for the r8→r10 blind spot: the replica used to
    collapse Decimal→float, so Spark's Decimal('0.50') hashed equal to
    the oracle's float64 0.5 HERE while the driver's string-level hash
    flagged '0.50' != '0.5' (CORRECTNESS_r10 agg_percentile_audit).
    The replica must be at-least-as-strict than the driver on Decimal:
    scale is preserved, and a Decimal never matches a float."""
    assert canon_value(Decimal("0.50")) != canon_value(0.5)
    assert canon_value(Decimal("0.5")) != canon_value(0.5)
    # same-scale decimals on both sides still match (driver behavior:
    # '0.50' == '0.50')
    assert canon_value(Decimal("0.50")) == canon_value(Decimal("0.50"))
    assert canon_value(Decimal("0.50")) != canon_value(Decimal("0.5"))
