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
