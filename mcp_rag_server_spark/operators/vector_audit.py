"""Embedding-dimension audits (round-4 additions to the ANN surface).

``sim_matryoshka_topk`` measures retrieval recall when scoring only a
PREFIX of each embedding — the Matryoshka representation-learning
deployment question (Kusupati et al. 2022, public): models trained with
MRL pack coarse-to-fine structure into prefixes, so serving can score
8/16/32 dims and rescore survivors at full width. The audit quantifies
what that costs on a given corpus: recall@k of each prefix width's
top-k against the full-width top-k, all from ONE scan.

Scale shape: identical to sim_ivf_recall — one scored pass feeds every
ranking (the stack/unpivot is free column math inside codegen), each
ranking is a bounded per-group window, and the overlap join touches k
rows per width. At 100 TB the full-width side is the sampled audit run,
exactly like production ANN recall monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.vector import cosine_score, duckdb_cosine
from mcp_rag_server_spark.registry import register

#: Prefix widths audited (the last is the full fixture width = exact).
MAT_DIMS = (8, 16, 32, 64)
MAT_K = 10


def _duck_prefix_cosine(d: str) -> str:
    return duckdb_cosine(
        f"list_slice(e.embedding, 1, {d})", f"list_slice(q.qv, 1, {d})"
    )


@register(
    "sim_matryoshka_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
dims AS (SELECT unnest([{", ".join(map(str, MAT_DIMS))}]) AS n_dims),
scored AS (
  SELECT d.n_dims, e.vec_id,
         CASE d.n_dims
           {" ".join(f"WHEN {d} THEN round({_duck_prefix_cosine(d)}, 4)" for d in MAT_DIMS)}
         END AS score
  FROM embeddings e CROSS JOIN q CROSS JOIN dims d
),
exact_topk AS (
  SELECT vec_id FROM scored WHERE n_dims = {MAT_DIMS[-1]}
  ORDER BY score DESC, vec_id ASC LIMIT {MAT_K}
),
ranked AS (
  SELECT n_dims, vec_id,
         row_number() OVER (PARTITION BY n_dims
                            ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored
),
overlap AS (
  SELECT r.n_dims, COUNT(*) AS n_overlap
  FROM ranked r JOIN exact_topk e USING (vec_id)
  WHERE r.rn <= {MAT_K}
  GROUP BY r.n_dims
)
SELECT d.n_dims,
       {MAT_K} AS k,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(COALESCE(o.n_overlap, 0) / {MAT_K}.0, 4) AS recall_at_k
FROM dims d LEFT JOIN overlap o USING (n_dims)
ORDER BY d.n_dims
""",
    description="Matryoshka prefix-dimension audit: recall@10 of top-k"
    " scored on the first 8/16/32 dims vs the full 64 — the"
    " dimension-vs-accuracy dial prefix-truncated serving is tuned by"
    " (the SQ8/IVF audits' sibling for width reduction)",
    tags=("similarity", "vector", "matryoshka", "recall"),
)
def sim_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four prefix scores are computed together (four codegen'd HOF
    folds over progressively longer slices of the same array — no
    shuffle for scoring); stack() unpivots them so each width's ranking
    is one bounded window, and overlap against the full-width top-k is
    a k-row broadcast join. Catalyst re-evaluates the scored subtree
    for the exact-topk branch (cheap here; at audit scale you'd
    checkpoint the scored sample once, as sim_ivf_recall notes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    wide = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        *[
            cosine_score(
                f"slice(embedding, 1, {d})", f"slice(qv, 1, {d})"
            ).alias(f"s{d}")
            for d in MAT_DIMS
        ],
    )
    stack_args = ", ".join(f"{d}, s{d}" for d in MAT_DIMS)
    scored = wide.selectExpr(
        "vec_id", f"stack({len(MAT_DIMS)}, {stack_args}) AS (n_dims, score)"
    )
    exact_topk = (
        scored.filter(F.col("n_dims") == MAT_DIMS[-1])
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(MAT_K)
        .select("vec_id")
    )
    ranked = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("n_dims").orderBy(
                F.desc("score"), F.asc("vec_id")
            )
        ),
    )
    overlap = (
        ranked.filter(F.col("rn") <= MAT_K)
        .join(F.broadcast(exact_topk), "vec_id")
        .groupBy("n_dims")
        .agg(F.count("*").alias("n_overlap"))
    )
    dims = emb.limit(1).select(
        F.explode(F.array(*[F.lit(d) for d in MAT_DIMS])).alias("n_dims")
    )
    return (
        dims.join(overlap, "n_dims", "left")
        .select(
            "n_dims",
            F.lit(MAT_K).alias("k"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.lit(float(MAT_K)), 4
            ).alias("recall_at_k"),
        )
        .orderBy("n_dims")
    )
