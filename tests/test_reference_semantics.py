"""Unit goldens for the reference's non-standard semantics (SURVEY.md
§7.5 risk 3): chunker stride/clamp rules, top-k clamps, hash-embedder
determinism. Each case cites the reference file:line it pins."""

from __future__ import annotations

import pytest

from mcp_rag_server_spark.functions.embedding import (
    HASH_DIM,
    hash_embed_query_vec,
)
from mcp_rag_server_spark.functions.text import (
    chunk_array,
    chunk_stride,
    clamp_overlap,
)
from mcp_rag_server_spark.operators.rag import clamp_top_k


def ref_split_chunks(text: str, size: int = 800, overlap: int = 120) -> list[str]:
    """Verbatim splitChunks logic (reference src/indexer.ts:201-215),
    including the clamp applied by the Indexer ctor (indexer.ts:118-122)."""
    overlap = clamp_overlap(size, overlap)
    out, i = [], 0
    while i < len(text):
        out.append(text[i : i + size])
        i += max(1, size - overlap)
    return out


def spark_chunks(spark, text: str, size: int, overlap: int) -> list[str]:
    df = spark.createDataFrame([(text,)], "text string").select(
        chunk_array("text", size, overlap).alias("c")
    )
    return df.first()["c"]


CASES = [
    ("", 10, 3),                 # empty text -> zero chunks
    ("short", 800, 120),         # shorter than size -> one chunk
    ("abcdefghij", 10, 3),       # exactly one window
    ("abcdefghijk", 10, 3),      # one char past -> second short chunk
    ("a" * 100 + "b" * 100, 30, 7),
    ("xyz" * 50, 9, 9),          # overlap == size -> 15% clamp (ts:118-122)
    ("hello world", 4, 10),      # overlap > size -> clamp
    ("abcdef", 1, 0),            # stride-1 degenerate: every char a chunk
    ("abcdef", 2, 1),            # stride 1 via overlap
]


@pytest.mark.parametrize("text,size,overlap", CASES)
def test_chunk_array_matches_reference(spark, text, size, overlap):
    assert spark_chunks(spark, text, size, overlap) == ref_split_chunks(
        text, size, overlap
    )


def test_overlap_clamp_values():
    # reference src/indexer.ts:118-122: overlap >= size -> floor(size*0.15)
    assert clamp_overlap(800, 120) == 120
    assert clamp_overlap(10, 10) == 1
    assert clamp_overlap(10, 99) == 1
    assert clamp_overlap(100, 100) == 15
    assert chunk_stride(1, 0) == 1  # max(1, ...) floor (indexer.ts:213)
    assert chunk_stride(2, 1) == 1


def test_top_k_clamp():
    # reference src/index.ts:62-64, 269: clamp to [1, 50], default 5
    assert clamp_top_k(0) == 1
    assert clamp_top_k(-3) == 1
    assert clamp_top_k(5) == 5
    assert clamp_top_k(50) == 50
    assert clamp_top_k(999) == 50


def test_hash_embedder_deterministic_and_normalized():
    v1 = hash_embed_query_vec("the quick brown fox")
    v2 = hash_embed_query_vec("the quick brown fox")
    assert v1 == v2 and len(v1) == HASH_DIM
    assert sum(x * x for x in v1) == pytest.approx(1.0)
    assert hash_embed_query_vec("") == [0.0] * HASH_DIM


def test_chunker_property_parity_with_reference(spark):
    """Property-based parity: for arbitrary text/size/overlap (including
    the stride-1 degenerate case and overlap-clamp fallback), the SQL
    chunker equals the reference splitChunks algorithm verbatim."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mcp_rag_server_spark.functions.text import chunk_array, clamp_overlap
    from tests.test_ingest import ref_split_chunks

    import pyspark.sql.functions as F

    cases = []

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        text=st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=400,
        ),
        size=st.integers(min_value=1, max_value=50),
        overlap=st.integers(min_value=0, max_value=80),
    )
    def collect(text, size, overlap):
        cases.append((text, size, overlap))

    collect()
    # One Spark job for all hypothesis-generated cases (per-case Spark
    # round-trips would take minutes): evaluate chunk_array per row with
    # its own geometry via a CASE over the distinct geometries.
    rows = [(i, t, s, o) for i, (t, s, o) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, text string, size int, overlap int")
    geoms = sorted({(s, o) for _, _, s, o in rows})
    expr = None
    for s_, o_ in geoms:
        cond = (F.col("size") == s_) & (F.col("overlap") == o_)
        b = chunk_array(F.col("text"), s_, o_)
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    got = {
        r["i"]: r["chunks"]
        for r in df.select("i", expr.alias("chunks")).collect()
    }
    for i, (t, s_, o_) in enumerate(cases):
        # chunk_array = constructor-level overlap clamp (indexer.ts:118-122)
        # + splitChunks stride (indexer.ts:201-215); the raw reference
        # splitChunks never sees an unclamped overlap in practice.
        expected = ref_split_chunks(t, s_, clamp_overlap(s_, o_))
        assert got[i] == expected, (t, s_, o_)


def test_normalize_event_ts_both_encodings(spark):
    """Fixture vintages encode events.ts two ways (TESTDATA regenerations
    changed TIMESTAMP(NANOS) → MICROS in round 4); normalize_event_ts
    must yield the identical session-tz TIMESTAMP for both."""
    import datetime

    from pyspark.sql import functions as F

    from mcp_rag_server_spark.catalog import normalize_event_ts

    micros = 1_704_067_200_123_456  # 2024-01-01T00:00:00.123456Z
    legacy = spark.range(1).select(
        F.lit(micros * 1000 + 789).cast("long").alias("ts")  # ns + sub-µs
    )
    modern = spark.range(1).select(
        F.timestamp_micros(F.lit(micros)).cast("timestamp_ntz").alias("ts")
    )
    expect = datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)
    for df in (legacy, modern):
        out = normalize_event_ts(df)
        assert dict(out.dtypes)["ts"] == "timestamp"
        got = out.collect()[0]["ts"]
        assert got.replace(tzinfo=None) == expect, got
    # already-TIMESTAMP input passes through untouched
    passthrough = normalize_event_ts(
        spark.range(1).select(F.timestamp_micros(F.lit(micros)).alias("ts"))
    )
    assert dict(passthrough.dtypes)["ts"] == "timestamp"


def test_ols_matches_numpy_lstsq(spark):
    """agg_ols_sufficient_stats' closed-form Cramer solve must agree
    with an independent dense least-squares solve (numpy lstsq) on the
    same rounded inputs — guards the determinant cofactor algebra,
    which a cross-engine hash alone cannot (both engines would compute
    the same wrong formula; the r6 det2 cofactor bug was caught exactly
    this way)."""
    import numpy as np

    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    got = (
        load_all()["agg_ols_sufficient_stats"].spark_fn(spark, sf).toPandas()
    )
    li = spark.read.parquet(f"{sf}/lineitem.parquet").toPandas()
    for _, row in got.iterrows():
        g = li[li["l_returnflag"] == row["l_returnflag"]]
        X = np.column_stack(
            [
                np.ones(len(g)),
                np.round(g["l_quantity"].to_numpy(float), 4),
                np.round(g["l_discount"].to_numpy(float), 4),
            ]
        )
        y = np.round(g["l_extendedprice"].to_numpy(float), 4)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert abs(row["beta_intercept"] - beta[0]) < 1e-3
        assert abs(row["beta_quantity"] - beta[1]) < 1e-4
        assert abs(row["beta_discount"] - beta[2]) < 1e-2
        pred = X @ beta
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert abs(row["r_squared"] - r2) < 1e-5


def test_pc1_matches_numpy_power_iteration(spark):
    """sim_power_iteration_pc1's distributed matvec loop must agree
    with an independent numpy replay of the SAME three power
    iterations from the same 1/8 start on numpy's own covariance —
    guards the sufficient-statistics covariance identity and the
    matvec/normalization algebra (cross-engine hashing can't: both
    engines share one SQL formula). Also sanity-checks the direction
    against numpy's exact eigenvector."""
    import numpy as np

    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    got = (
        load_all()["sim_power_iteration_pc1"]
        .spark_fn(spark, sf)
        .toPandas()
        .sort_values("dim")
    )
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, ddof=1)
    v = np.full(64, 0.125)
    for _ in range(3):
        w = C @ v
        v = w / np.sqrt((w * w).sum())
    assert np.abs(got["loading"].to_numpy() - v).max() < 1e-4
    assert abs(got["lambda_est"].iloc[0] - np.sqrt((w * w).sum())) < 1e-2
    # NO convergence-to-exact-PC1 assert: the fixture embeddings are
    # near-isotropic (top eigenvalue ratio ~1.07 at sf0.001 — probed),
    # so ANY fixed iteration count sits far from the exact
    # eigenvector; the operator reports that honestly via
    # lambda_est/explained_share. Sanity: the Rayleigh norm cannot
    # exceed the spectral bound (largest exact eigenvalue + rounding
    # slack) and must be positive.
    evals = np.linalg.eigvalsh(C)
    assert 0 < got["lambda_est"].iloc[0] <= evals[-1] + 1e-6
