"""Random-hyperplane (SimHash-for-vectors) LSH over the embeddings table
— the label-free scale path for embedding near-dup / ANN candidate
generation (`dd_embedding_neardup` blocks on labels, which only works
when a blocking key exists; hyperplane buckets need nothing but the
vectors).

Design: K fixed hyperplanes (deterministically derived from md5, inlined
as literals in BOTH engines' SQL — no RNG, no MLlib model state);
bucket = K-bit sign pattern of the projections. Same-bucket pairs are
candidates; exact rounded cosine filters them. Bucket join shuffles on
the bucket key, so cost is Σ bucket² — with K=8 over L2-normalized
vectors the 500-row fixture yields a few hundred candidates, and at
100 TB K grows with corpus size (and/or multiple tables are OR'd, the
standard multi-probe trade).

Spark's MLlib BucketedRandomProjectionLSH implements the same family
with random planes; this version is deliberately seed-free so the DuckDB
oracle can recompute it bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.vector import cosine_score, duckdb_cosine
from mcp_rag_server_spark.registry import register

N_PLANES = 8
DIM = 64
LSH_COSINE_THRESHOLD = 0.3


def _plane(i: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is
    (md5(i:j) mod 2001 - 1000) / 1000 ∈ [-1, 1]. No RNG — both engines
    receive the same literals."""
    return [
        (int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
        / 1000.0
        for j in range(DIM)
    ]


def _dot_literal_sql(vec_col: str, plane: list[float], dialect: str) -> str:
    """Projection of a vector column onto a literal plane, as an unrolled
    sum — identical arithmetic (and order) in both engines, and cheap:
    64 multiply-adds, no array literal, no HOF."""
    idx = (lambda j: f"{vec_col}[{j + 1}]") if dialect == "duckdb" else (
        lambda j: f"element_at({vec_col}, {j + 1})"
    )
    return (
        "("
        + " + ".join(
            f"CAST({idx(j)} AS DOUBLE) * ({plane[j]!r})" for j in range(DIM)
        )
        + ")"
    )


def _bucket_sql(vec_col: str, dialect: str) -> str:
    bits = [
        f"(CASE WHEN {_dot_literal_sql(vec_col, _plane(i), dialect)} >= 0 "
        f"THEN {2 ** i} ELSE 0 END)"
        for i in range(N_PLANES)
    ]
    return "(" + " + ".join(bits) + ")"


@register(
    "sim_hyperplane_lsh",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql("embedding", "duckdb")} AS bucket
  FROM embeddings
)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.bucket,
       round({duckdb_cosine("x.embedding", "y.embedding")}, 4) AS score
FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round({duckdb_cosine("x.embedding", "y.embedding")}, 4)
      >= {LSH_COSINE_THRESHOLD}
ORDER BY vec_a, vec_b
""",
    description="random-hyperplane LSH near-dup over embeddings: sign-bit"
    " bucket join + exact cosine verify (label-free scale path)",
    tags=("similarity", "vector", "lsh"),
)
def sim_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        "embedding",
        F.expr(_bucket_sql("embedding", "spark")).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    score = cosine_score("x.embedding", "y.embedding")
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.bucket").alias("bucket"),
            score.alias("score"),
        )
        .filter(F.col("score") >= LSH_COSINE_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )
