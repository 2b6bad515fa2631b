"""Regression tests for nested higher-order-function stability.

Why this file exists (cited from functions/vector.py): building nested
HOFs from *Python lambdas* lets PySpark auto-generate lambda variable
names; when Catalyst's CollapseProject folds a projection that built an
array into a projection that consumes it, generated names can collide
and silently rebind — producing wrong, session-history-dependent
results. Every HOF in this engine is therefore built from SQL text with
explicit, distinct variable names. These tests pin the correctness of
those expressions under exactly the collapse pattern that bites.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_rag_server_spark.functions.vector import cosine, dot, l2_norm


def ref_cosine(a, b):
    """Reference Embeddings.cosine (src/embeddings.ts:77-92) in Python:
    min-length truncation, 1e-10 epsilon, empty -> 0."""
    n = min(len(a), len(b))
    if len(a) == 0 or len(b) == 0:
        return 0.0
    num = sum(float(x) * float(y) for x, y in zip(a[:n], b[:n]))
    den = math.sqrt(sum(float(x) ** 2 for x in a[:n])) * math.sqrt(
        sum(float(y) ** 2 for y in b[:n])
    ) + 1e-10
    return num / den


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (0, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (1, [1.0, 0.0], [0.0, 1.0]),
        (2, [], [1.0, 2.0]),          # empty a -> 0
        (3, [1.0, 2.0, 3.0], [1.0]),  # length mismatch -> min-length
        (4, [0.0, 0.0], [0.0, 0.0]),  # zero vectors -> epsilon saves /0
    ]
    return spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )


def test_cosine_reference_semantics(spark, vec_df):
    got = {r["id"]: r["c"] for r in vec_df.select("id", cosine("a", "b").alias("c")).collect()}
    rows = {r["id"]: (r["a"], r["b"]) for r in vec_df.collect()}
    for i, (a, b) in rows.items():
        assert got[i] == pytest.approx(ref_cosine(a, b), abs=1e-12), i


def test_dot_and_norm(spark, vec_df):
    row = (
        vec_df.filter("id = 0")
        .select(dot("a", "b").alias("d"), l2_norm("a").alias("n"))
        .first()
    )
    assert row["d"] == pytest.approx(32.0)
    assert row["n"] == pytest.approx(math.sqrt(14.0))


def test_cosine_survives_projection_collapse(spark):
    """The historical failure: the consumed arrays are themselves built
    by transform() in a projection that Catalyst collapses into the
    cosine projection. With colliding lambda variables the result
    silently changes; with explicit names it must equal numpy."""
    n = 8
    df = (
        spark.range(50)
        .select(
            "id",
            F.expr(
                f"transform(sequence(1, {n}), gen_a -> "
                "CAST(gen_a * (id + 1) % 7 + 1 AS FLOAT))"
            ).alias("a"),
            F.expr(
                f"transform(sequence(1, {n}), gen_b -> "
                "CAST(gen_b * (id + 2) % 5 + 1 AS FLOAT))"
            ).alias("b"),
        )
        # No barrier: cosine's projection sits directly on the builder's,
        # inviting CollapseProject.
        .select("id", cosine("a", "b").alias("c"))
    )
    got = {r["id"]: r["c"] for r in df.collect()}
    for i in range(50):
        a = np.array([(g * (i + 1)) % 7 + 1 for g in range(1, n + 1)], dtype=np.float32)
        b = np.array([(g * (i + 2)) % 5 + 1 for g in range(1, n + 1)], dtype=np.float32)
        assert got[i] == pytest.approx(ref_cosine(list(a), list(b)), rel=1e-12), i


def test_nested_shingles_inside_consumer_projection(spark):
    """word_shingles (sequence→transform→slice→array_join) consumed by a
    size() in the same collapsed projection."""
    from mcp_rag_server_spark.functions.text import word_shingles

    df = (
        spark.createDataFrame(
            [("a b c d e",), ("x y",), ("",)], "text string"
        )
        .select(F.split("text", " ").alias("toks"))
        .select(F.size(word_shingles("toks", 3)).alias("n"))
    )
    assert [r["n"] for r in df.collect()] == [3, 0, 0]
