"""rag_query — the reference's flagship operator, Spark-first.

Reference pipeline (src/index.ts:260-284): embed query → cosine against
every chunk vector (O(N·d) single-threaded scan, src/index.ts:267) →
sort desc → slice top_k (clamped 1..50, default 5) → project
{path, score(4dp), snippet, totalLines, fileSize}.

Spark shape: the corpus scan is a parquet read that partitions across
executors; the query vector is a one-row broadcast (a literal at plan
time), scoring is a codegen'd higher-order-function expression, and
``orderBy(desc).limit(k)`` is planned as TakeOrderedAndProject — a
per-partition heap top-k + driver merge, not a full sort. That plan is
exactly what survives a 1000-executor 100 TB scan: no shuffle at all,
one narrow pass, k rows back to the driver.

Determinism (SURVEY.md §2.10 quirk 3): the reference's JS sort is
unstable on ties; we define the total order (rounded score desc, id asc)
and use it in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.vector import (
    array_float_literal,
    cosine_score,
    duckdb_cosine,
)
from mcp_rag_server_spark.registry import register

#: Reference src/index.ts:62-64
RAG_QUERY_MAX_RESULTS = 50
RAG_QUERY_DEFAULT_K = 5


def clamp_top_k(k: int) -> int:
    """Reference clamp: max(1, min(50, k)) — src/index.ts:269."""
    return max(1, min(RAG_QUERY_MAX_RESULTS, k))


def topk_by_vector(
    emb: DataFrame,
    query_vec,
    k: int = RAG_QUERY_DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score ``emb`` against a literal query vector and return the top-k.

    ``query_vec`` may be a Python list (driver-side embedded query — the
    reference embeds the query string once on the caller side,
    src/index.ts:266) or a one-row DataFrame with column ``qv``.
    """
    k = clamp_top_k(k)
    if isinstance(query_vec, DataFrame):
        scored = emb.crossJoin(F.broadcast(query_vec))
        qv_sql = "qv"
    else:
        scored = emb
        qv_sql = array_float_literal(query_vec)
    return (
        scored.withColumn("score", cosine_score(vec_col, qv_sql))
        .drop("qv")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


@register(
    "rag_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       round({duckdb_cosine('e.embedding', 'q.qv')}, 4) AS score
FROM embeddings e CROSS JOIN q
ORDER BY score DESC, e.vec_id ASC
LIMIT 5
""",
    description="flagship: brute-force cosine top-k (reference rag_query core)",
    tags=("rag", "vector", "topk"),
    bench=True,
)
def rag_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most similar embeddings to the vec_id=0 vector.

    Plan: parquet scan → broadcast 1-row query → codegen cosine →
    TakeOrderedAndProject(k=5). Zero shuffles.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return topk_by_vector(emb, q, k=5).select("vec_id", "label", "score")


@register(
    "rag_query_result",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round({duckdb_cosine('e.embedding', 'q.qv')}, 4) AS score
  FROM embeddings e CROSS JOIN q
  ORDER BY score DESC, e.vec_id ASC
  LIMIT 5
)
SELECT s.vec_id, s.score,
       substring(d.text, 1, 200) AS snippet,
       d.n_chars, d.lang, d.source
FROM scored s JOIN documents d ON d.doc_id = s.vec_id
ORDER BY s.score DESC, s.vec_id ASC
""",
    description="rag_query full result contract: top-k joined back to documents"
    " {path,score,snippet,totalLines,fileSize} analog (reference src/index.ts:269-275)",
    tags=("rag", "vector", "topk", "join"),
    bench=True,
)
def rag_query_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference result shape: top-k then join to the documents table for
    snippet + metadata (the reference denormalizes these per chunk;
    FIXTURES.md keeps documents/embeddings as separate fixture tables, so
    the projection is a broadcast join on the 5-row top-k side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    top = topk_by_vector(emb, q, k=5).select("vec_id", "score")
    return (
        F.broadcast(top)
        .join(docs, top["vec_id"] == docs["doc_id"])
        .select(
            "vec_id",
            "score",
            F.substring("text", 1, 200).alias("snippet"),
            "n_chars",
            "lang",
            "source",
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )


@register(
    "rag_hybrid_topk",
    oracle=f"""
WITH q AS (
  SELECT list_distinct(string_split(text, ' ')) AS qtoks
  FROM documents WHERE doc_id = 0
),
qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT d.doc_id,
         list_distinct(string_split(d.text, ' ')) AS toks,
         e.embedding
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  WHERE d.doc_id <> 0
)
SELECT c.doc_id,
       round(CAST(len(list_intersect(c.toks, q.qtoks)) AS DOUBLE)
             / len(list_distinct(list_concat(c.toks, q.qtoks))), 4) AS lex_score,
       round({duckdb_cosine('c.embedding', 'qv.qv')}, 4) AS vec_score,
       round({duckdb_cosine('c.embedding', 'qv.qv')} * 0.5
             + CAST(len(list_intersect(c.toks, q.qtoks)) AS DOUBLE)
               / len(list_distinct(list_concat(c.toks, q.qtoks))) * 0.5,
             4) AS hybrid_score
FROM cand c CROSS JOIN q CROSS JOIN qv
ORDER BY hybrid_score DESC, c.doc_id ASC
LIMIT 10
""",
    description="hybrid retrieval: equal-weight fusion of lexical Jaccard"
    " and cosine similarity, top-10 — the lexical+vector search real RAG"
    " deployments run (extends the reference's vector-only rag_query)",
    tags=("rag", "vector", "text", "topk"),
)
def rag_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both scores are computed from raw doubles in ONE pass over the
    candidates (same expression tree both engines, rounded only at the
    output/sort boundary). Plan: documents⋈embeddings on id (broadcast at
    fixture scale), 1-row query side broadcast, codegen scoring,
    TakeOrderedAndProject(10) — the corpus is scanned once and never
    shuffled; at 100 TB the candidate set would first be cut by an index
    (sim_ivf_topk's cell pruning or the LSH buckets) before this exact
    fusion rescoring."""
    from mcp_rag_server_spark.functions.vector import cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.array_distinct(F.split("text", " ")).alias("qtoks"))
        .crossJoin(
            emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
        )
    )
    cand = (
        docs.filter(F.col("doc_id") != 0)
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
        .join(emb, F.col("doc_id") == F.col("vec_id"))
    )
    lex = F.size(F.array_intersect("toks", "qtoks")).cast("double") / F.size(
        F.array_union("toks", "qtoks")
    )
    vec = cosine("embedding", "qv")
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.round(lex, 4).alias("lex_score"),
            F.round(vec, 4).alias("vec_score"),
            F.round(vec * 0.5 + lex * 0.5, 4).alias("hybrid_score"),
        )
        .orderBy(F.desc("hybrid_score"), F.asc("doc_id"))
        .limit(10)
    )
