"""Chunking operators — the reference's ingest core, Spark-first.

Reference: ``Indexer.splitChunks`` (src/indexer.ts:201-215) feeds the
chunk table build loop (src/indexer.ts:263-287). Here chunking is a pure
SQL expression exploded with ``posexplode`` — one narrow scan stage, no
Python, no shuffle; at 100 TB this parallelizes per input split.

``read_file``'s line-range slice (reference src/index.ts:307-312;
1-based inclusive, clamped to bounds) is expressed over the documents
fixture as a token-range slice (the fixture text has no newlines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.ids import dense_chunk_ids
from mcp_rag_server_spark.functions.text import (
    chunk_array,
    duckdb_chunk_sql,
)
from mcp_rag_server_spark.registry import register

#: Chunk geometry used for the fixture queries. Reference defaults are
#: 800/120 (src/config.ts:114-127); fixture documents average ~300 chars,
#: so we use 200/30 to actually exercise multi-chunk explosion.
DOC_CHUNK_SIZE = 200
DOC_CHUNK_OVERLAP = 30


def explode_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 800,
    overlap: int = 120,
) -> DataFrame:
    """documents → chunk rows (id, chunk ordinal, chunk_text).

    ``posexplode`` assigns the 0-based per-document ordinal — the
    reference's ``chunk`` field (src/types.ts:11) — without any window
    function or shuffle.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(chunk_array(F.col(text_col), size, overlap)).alias(
            "chunk", "chunk_text"
        ),
    ).select(F.col(id_col), F.col("chunk").cast("int"), "chunk_text")


@register(
    "chunk_split",
    oracle=duckdb_chunk_sql(
        "documents", "doc_id", "text", DOC_CHUNK_SIZE, DOC_CHUNK_OVERLAP
    ),
    description="splitChunks parity: overlapping char windows via posexplode"
    " (reference src/indexer.ts:201-215)",
    tags=("chunking", "ingest"),
    bench=True,
)
def chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return explode_chunks(docs, size=DOC_CHUNK_SIZE, overlap=DOC_CHUNK_OVERLAP)


@register(
    "chunk_split_clamped",
    oracle=duckdb_chunk_sql("documents", "doc_id", "text", 100, 150),
    description="overlap clamp (F2): overlap >= size falls back to"
    " floor(size*0.15) (reference src/indexer.ts:118-122) — both engines"
    " chunk with the clamped stride",
    tags=("chunking", "ingest"),
)
def chunk_split_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size=100, overlap=150 is invalid (stride would be negative); the
    clamp (functions/text.py::clamp_overlap) drops overlap to 15, stride
    85 — applied identically inside chunk_array and duckdb_chunk_sql, so
    a clamp regression on either side breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return explode_chunks(docs, size=100, overlap=150)


@register(
    "chunks_table",
    oracle=f"""
WITH c AS ({duckdb_chunk_sql("documents", "doc_id", "text",
                             DOC_CHUNK_SIZE, DOC_CHUNK_OVERLAP)})
SELECT row_number() OVER (ORDER BY c.doc_id, c.chunk) AS id,
       c.doc_id, c.chunk, c.chunk_text,
       d.n_chars AS file_size,
       d.lang, d.source
FROM c JOIN documents d USING (doc_id)
""",
    description="full chunks-table build: ids + denormalized file metadata"
    " (reference Doc record, src/types.ts:5-20)",
    tags=("chunking", "ingest"),
)
def chunks_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core `Doc` table (id, path→doc_id, chunk, text,
    file_size denormalized; src/types.ts:5-20). Ids equal a deterministic
    ``row_number`` over (doc_id, chunk) — NOT ``monotonically_increasing_id``,
    which is partition-dependent and breaks golden reproducibility —
    but are computed scale-safe via :func:`dense_chunk_ids`: the only
    ordered step is a running sum over one row per *document*, never a
    global sort of the chunk rows (the r2 single-reducer window is gone;
    plan-shape test: tests/test_plan_shapes.py::test_chunks_table_id_window_is_per_file).
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = explode_chunks(docs, size=DOC_CHUNK_SIZE, overlap=DOC_CHUNK_OVERLAP)
    return (
        dense_chunk_ids(chunks, "doc_id", start_id=1)
        .join(
            docs.select("doc_id", "n_chars", "lang", "source"),
            "doc_id",
        )
        .select(
            "id",
            "doc_id",
            "chunk",
            "chunk_text",
            F.col("n_chars").alias("file_size"),
            "lang",
            "source",
        )
    )


@register(
    "read_range",
    oracle="""
SELECT doc_id,
       array_to_string(
         list_slice(string_split(text, ' '), 3, 10), ' ') AS excerpt,
       -- CASE: NULL text slices to zero tokens. Without it the two
       -- formulas diverge on NULL because least/greatest SKIP null
       -- arguments in both engines, each rescuing a different operand
       CASE WHEN text IS NULL THEN 0
            ELSE least(greatest(len(string_split(text, ' ')) - 2, 0), 8)
       END AS n_tokens
FROM documents
WHERE doc_id % 50 = 0
""",
    description="read_file line-range analog: clamped 1-based inclusive token"
    " slice (reference src/index.ts:307-312)",
    tags=("read_file",),
)
def read_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-range slice [3, 10] (1-based inclusive, clamped to bounds),
    mirroring the reference's line slice semantics: s = max(0, start-1),
    e = min(len, end) (src/index.ts:307-312). The fixture text is a
    single line, so tokens stand in for lines."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    toks = F.split(F.col("text"), " ")
    start, end = 3, 10
    # slice(start, length): length = min(len, end) - (start-1), floored
    # at 0. The NULL-text CASE matches the oracle: Spark's least/
    # greatest skip NULL args, so least(size(NULL), 10) would rescue 10
    # and fabricate an 8-token range for a textless doc.
    length = F.when(F.col("text").isNull(), F.lit(0)).otherwise(
        F.greatest(
            F.least(F.size(toks), F.lit(end)) - F.lit(start - 1), F.lit(0)
        )
    )
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, start, length), " ").alias("excerpt"),
        length.cast("bigint").alias("n_tokens"),
    )
