"""Text column expressions: chunking, tokenization, shingling.

The chunker is exact-parity with the reference's ``splitChunks``
(reference src/indexer.ts:201-215): fixed-size character windows with
stride ``max(1, size - overlap)``; the final chunk may be short; empty
text yields zero chunks. The overlap clamp mirrors reference
src/indexer.ts:118-122 (overlap >= size → floor(size*0.15)).

All builders are pure Spark SQL expressions (whole-stage codegen; the
chunk explosion is ``posexplode`` — a narrow transform, no shuffle, so
chunking 100 TB of documents is a single scan-shaped stage).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clamp_overlap(size: int, overlap: int) -> int:
    """Reference src/indexer.ts:118-122: invalid overlap falls back to ~15%."""
    if overlap >= size:
        return max(0, int(size * 0.15))
    return overlap


def chunk_stride(size: int, overlap: int) -> int:
    """Reference src/indexer.ts:213: stride = max(1, size - overlap)."""
    return max(1, size - clamp_overlap(size, overlap))


def chunk_count(text: Column | str, size: int = 800, overlap: int = 120) -> Column:
    """Number of chunks: ceil(len/stride) == floor((len-1)/stride)+1 for
    len>0, else 0 (the reference loop runs while i < len)."""
    stride = chunk_stride(size, overlap)
    n = F.length(_col(text))
    return F.when(n > 0, F.floor((n - 1) / stride) + 1).otherwise(F.lit(0)).cast("int")


def chunk_array(text: Column | str, size: int = 800, overlap: int = 120) -> Column:
    """array<string> of chunks, exact splitChunks parity."""
    text = _col(text)
    stride = chunk_stride(size, overlap)
    cnt = chunk_count(text, size, overlap)
    chunks = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: text.substr(i * stride + 1, F.lit(size)),
    )
    return F.when(cnt > 0, chunks).otherwise(F.array().cast("array<string>"))


def duckdb_chunk_sql(
    table: str,
    id_col: str,
    text_col: str,
    size: int = 800,
    overlap: int = 120,
) -> str:
    """DuckDB twin: explode chunk ordinals with unnest(range(...))."""
    stride = chunk_stride(size, overlap)
    cnt = (
        f"CASE WHEN length({text_col}) > 0 "
        f"THEN CAST(floor((length({text_col}) - 1) / {stride}) + 1 AS BIGINT) "
        f"ELSE 0 END"
    )
    return f"""
SELECT {id_col},
       CAST(i AS INT) AS chunk,
       substring({text_col}, CAST(i * {stride} + 1 AS INT), {size}) AS chunk_text
FROM (SELECT {id_col}, {text_col}, unnest(range(0, {cnt})) AS i FROM {table})
""".strip()


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(_col(text), r"\s+")


DUCKDB_TOKENS = r"string_split_regex({c}, '\s+')"


def word_shingles_sql(toks_sql: str, k: int = 3, var: str = "shi") -> str:
    """k-word shingles (array<string>) as SQL text; fewer than k tokens →
    empty array. Built from ``slice`` + ``array_join`` over an ordinal
    ``sequence`` — no UDF, no shuffle.

    SQL text with an explicit lambda variable (``var``) rather than a
    Python-lambda HOF: nested lambda-built HOFs mis-bind variables after
    projection collapse (see functions/vector.py docstring). Callers that
    nest this inside another HOF must pass distinct variable names.

    The ``greatest(..., 1)`` + outer ``slice`` dance avoids an untyped
    empty-array literal: sequence(1, max(n,1)) always has ≥1 element, and
    slice(..., 1, n) trims to the true (possibly zero) shingle count.
    """
    n = f"greatest(size({toks_sql}) - {k - 1}, 0)"
    return (
        f"slice(transform(sequence(1, greatest({n}, 1)), "
        f"{var} -> array_join(slice({toks_sql}, {var}, {k}), ' ')), 1, {n})"
    )


def word_shingles(toks_sql: str, k: int = 3, var: str = "shi") -> Column:
    """Column form of :func:`word_shingles_sql` (input is SQL text, e.g.
    ``\"split(text, ' ')\"``)."""
    return F.expr(word_shingles_sql(toks_sql, k, var))


def duckdb_word_shingles(toks: str, k: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles`."""
    n_sh = f"greatest(len({toks}) - {k - 1}, 0)"
    return (
        f"list_transform(range(1, {n_sh} + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' '))"
    )
