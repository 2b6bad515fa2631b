"""read_file and list_files — the reference's tools #2/#3 as DataFrame
queries over an ingested corpus.

Reference:
  - ``read_file`` (src/index.ts:286-314): traversal guard, PDF branch
    (cached text), UTF-8 read, optional 1-based inclusive line range
    clamped to file bounds (src/index.ts:307-312).
  - ``list_files`` (src/index.ts:316-413): dir normalization
    (src/index.ts:330-341), recursive walk with maxDepth, extension
    filter (suppresses dir rows, still recurses, src/index.ts:377-388),
    dirs-first alphabetical sort (src/index.ts:400-404), entry limit
    default 500 / cap 5000 (src/index.ts:66-68).

Deliberate divergences (SURVEY.md §2.10 quirks):
  - the reference truncates at ``limit`` in traversal order *before*
    sorting (src/index.ts:362-370 vs 401-404); we sort, then limit —
    the returned set is the alphabetically-first N, which is
    deterministic and saner.
  - the reference's ``localeCompare`` sort is locale-dependent; we use
    binary (codepoint) ordering.

Scale shape: both queries are catalog lookups. ``read_file`` filters one
path (partition/file pruning if the store is partitioned by path
prefix) then slices lines with array ops — no shuffle. ``list_files``
is filter → orderBy → limit over a file-catalog DataFrame; Spark plans
TakeOrderedAndProject, so a 100M-file catalog returns N rows without a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.text import chunk_stride
from mcp_rag_server_spark.registry import register
from mcp_rag_server_spark.sources.files import normalize_rel_path

#: Reference src/index.ts:66-68.
LIST_FILES_DEFAULT_LIMIT = 500
LIST_FILES_MAX_LIMIT = 5000


def file_texts(chunks: DataFrame, chunk_size: int, chunk_overlap: int) -> DataFrame:
    """Reassemble full file text from the chunk store: each chunk after
    the first contributes its suffix past the overlap (stride chars of
    new text per chunk, except the final chunk which may be short).
    Inverse of splitChunks for stride = size - overlap >= 1."""
    stride = chunk_stride(chunk_size, chunk_overlap)
    piece = F.when(F.col("chunk") == 0, F.col("text")).otherwise(
        F.substring(F.col("text"), chunk_size - stride + 1, 0x7FFFFFFF)
    )
    return (
        chunks.withColumn("piece", piece)
        .groupBy("rel_path", "file_size", "line_count")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk", F.col("piece").alias("p")))
                    ),
                    lambda s: s["p"],
                ),
                "",
            ).alias("text")
        )
    )


def read_file(
    texts: DataFrame,
    path: str,
    start_line: int | None = None,
    end_line: int | None = None,
) -> DataFrame:
    """Line-range read (reference src/index.ts:286-314) over a
    (rel_path, text) DataFrame.

    1-based inclusive [start_line, end_line], clamped to the file's
    bounds (src/index.ts:307-312); no range → whole text. Returns a
    1-row DataFrame (rel_path, text, total_lines)."""
    path = normalize_rel_path(path)
    one = texts.filter(F.col("rel_path") == path)
    lines = F.split("text", r"\r?\n")
    total = F.size(lines)
    if start_line is None and end_line is None:
        return one.select("rel_path", "text", total.alias("total_lines"))
    s = F.greatest(F.lit(start_line or 1), F.lit(1))
    e = F.least(F.lit(end_line) if end_line is not None else total, total)
    n = F.greatest(e - s + 1, F.lit(0))
    return one.select(
        "rel_path",
        F.array_join(F.slice(lines, s, n), "\n").alias("text"),
        total.alias("total_lines"),
    )


def file_catalog(files: DataFrame) -> DataFrame:
    """Derive the directory tree from a file listing (rel_path, file_size):
    one row per file + one per ancestor directory.

    Columns: path, parent, depth (root children = 1), type ('dir'|'file'
    — sorts dirs first, matching src/index.ts:401-402), size (files
    only), ext (lowercased last suffix, '' when none, src/index.ts:387).
    """
    f = files.select(
        F.col("rel_path").alias("path"),
        F.lit("file").alias("type"),
        F.col("file_size").alias("size"),
    )
    # Ancestor dirs: prefixes of each file path.
    parts = F.split(F.col("rel_path"), "/")
    # sequence(1, n) DESCENDS when n < 1, so top-level files (one path
    # segment) must yield an empty ancestor array, not [1, 0].
    ancestors = F.when(
        F.size(parts) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(parts) - 1),
            lambda i: F.array_join(F.slice(parts, 1, i), "/"),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dirs = (
        files.select(F.explode(ancestors).alias("path"))
        .distinct()
        .select("path", F.lit("dir").alias("type"), F.lit(None).cast("long").alias("size"))
    )
    cat = f.unionByName(dirs)
    return cat.select(
        "path",
        "type",
        "size",
        F.when(
            F.col("path").contains("/"),
            F.regexp_replace("path", "/[^/]*$", ""),
        )
        .otherwise(F.lit(""))
        .alias("parent"),
        F.size(F.split("path", "/")).alias("depth"),
        F.when(F.col("type") == "file", F.lower(F.regexp_extract("path", r"\.([^.]+)$", 1)))
        .otherwise(F.lit(""))
        .alias("ext"),
    )


def list_files(
    catalog: DataFrame,
    dir: str | None = None,
    recursive: bool = False,
    max_depth: int | None = None,
    include_extensions: list[str] | None = None,
    limit: int = LIST_FILES_DEFAULT_LIMIT,
) -> DataFrame:
    """Reference ``list_files`` (src/index.ts:316-413) over the catalog.

    - ``dir`` normalized per src/index.ts:330-341; listing is of entries
      *under* dir.
    - non-recursive → direct children only; recursive → bounded by
      ``max_depth`` levels below dir (src/index.ts:361-373).
    - ``include_extensions``: lowercase, strip leading dot; when active,
      dir rows are suppressed (src/index.ts:377-388).
    - sort: dirs first, then path (src/index.ts:400-404; binary order).
    - limit: default 500, capped 5000 (src/index.ts:66-68), applied
      after the sort (deliberate divergence, module docstring).
    """
    base = normalize_rel_path(dir)
    limit = max(1, min(LIST_FILES_MAX_LIMIT, limit))
    base_depth = 0 if base == "" else len(base.split("/"))
    df = catalog
    if base:
        df = df.filter(F.col("path").startswith(base + "/"))
    rel_depth = F.col("depth") - base_depth
    if not recursive:
        df = df.filter(rel_depth == 1)
    elif max_depth is not None:
        df = df.filter(rel_depth <= max_depth)
    if include_extensions:
        exts = [e.lower().lstrip(".") for e in include_extensions]
        df = df.filter((F.col("type") == "file") & F.col("ext").isin(exts))
    return (
        df.select("path", "type", "size")
        .orderBy(F.col("type"), F.col("path"))
        .limit(limit)
    )


@register(
    "fileops_reassemble_text",
    oracle="""
SELECT doc_id, text FROM documents WHERE length(text) > 0 ORDER BY doc_id
""",
    description="read_file whole-text path: chunk-store reassembly"
    " (file_texts inverts splitChunks' overlap) must reproduce every"
    " original document byte-for-byte (reference src/index.ts:286-314"
    " reads PDF text back from the chunk cache the same way)",
    tags=("fileops", "read_file", "chunking"),
)
def fileops_reassemble_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip property as a driver row: explode documents with the
    fixture chunk geometry, then reassemble with file_texts (chunk 0
    whole, later chunks contribute the post-overlap suffix) — the oracle
    is simply the original text. One groupBy(rel_path) shuffle; at scale
    this is the read_file service path over a chunk store."""
    from mcp_rag_server_spark.operators.chunking import (
        DOC_CHUNK_OVERLAP,
        DOC_CHUNK_SIZE,
        explode_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        explode_chunks(docs, size=DOC_CHUNK_SIZE, overlap=DOC_CHUNK_OVERLAP)
        .withColumnRenamed("chunk_text", "text")
        .withColumn("rel_path", F.col("doc_id").cast("string"))
        .withColumn("file_size", F.lit(None).cast("long"))
        .withColumn("line_count", F.lit(None).cast("int"))
    )
    reassembled = file_texts(chunks, DOC_CHUNK_SIZE, DOC_CHUNK_OVERLAP)
    return (
        reassembled.select(
            F.col("rel_path").cast("bigint").alias("doc_id"), "text"
        )
        .orderBy("doc_id")
    )


#: Deterministic synthetic file tree over the ``documents`` fixture so
#: the list_files surface (reference src/index.ts:316-413) gets a
#: DuckDB-checkable correctness row: source/lang become directories,
#: each doc a file whose extension cycles txt/md/log on doc_id.
_TREE_PATH_SQL = (
    "source || '/' || lang || '/doc_' || CAST(doc_id AS {str_t}) || '.' || "
    "CASE doc_id % 3 WHEN 0 THEN 'txt' WHEN 1 THEN 'md' ELSE 'log' END"
)


def _doc_file_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a doc with no source or lang has no path in the derived tree —
    # the concat would yield a NULL path that sorts FIRST in Spark's
    # listing order but LAST in DuckDB's, shifting the LIMIT window
    docs = load_table(spark, sf_dir, "documents").filter(
        "source IS NOT NULL AND lang IS NOT NULL"
    )
    return docs.selectExpr(
        _TREE_PATH_SQL.format(str_t="STRING") + " AS rel_path",
        "n_chars AS file_size",
    )


@register(
    "fileops_list",
    oracle=f"""
WITH files AS (
  -- source/lang IS NOT NULL mirrors _doc_file_listing's pathless-doc
  -- exclusion
  SELECT {_TREE_PATH_SQL.format(str_t="VARCHAR")} AS path,
         n_chars AS size
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
),
dirs AS (
  -- ancestors by prefix-splitting the SAME path expression the files
  -- CTE uses (mirrors file_catalog's ancestor derivation), so a '/'
  -- inside any source/lang value yields identical dir rows both sides
  SELECT DISTINCT array_to_string(parts[1:CAST(i AS INT)], '/') AS path
  FROM (SELECT string_split(path, '/') AS parts FROM files),
       LATERAL (SELECT unnest(generate_series(1, len(parts) - 1)) AS i) t
),
cat AS (
  SELECT path, 'file' AS type, size FROM files
  UNION ALL
  SELECT path, 'dir' AS type, CAST(NULL AS BIGINT) AS size FROM dirs
)
SELECT path, type, size FROM cat ORDER BY type ASC, path ASC LIMIT 200
""",
    description="list_files over a doc-derived file tree: recursive walk,"
    " dirs-first binary sort, entry limit (reference src/index.ts:316-413)",
    tags=("fileops", "catalog"),
)
def fileops_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises T2 (dirs-first sort) + T3 (entry limit) + F8 (path
    shape) through the real file_catalog → list_files path; the plan is
    filter → TakeOrderedAndProject, so a 100M-file catalog returns the
    first N entries without a global sort."""
    cat = file_catalog(_doc_file_listing(spark, sf_dir))
    return list_files(cat, recursive=True, limit=200)


#: Requested-path shapes for the traversal-guard query, cycled on
#: doc_id % 6. Kinds 0-2 normalize to a path inside the root (plain,
#: ./-prefixed, and an up-and-back ``xx/../`` detour); kinds 3-5 escape
#: (leading ``..``, absolute path, and a ``../../../`` breakout) and
#: must be REJECTED by the guard (reference ensureWithinRoot,
#: src/indexer.ts:320-338 — read_file applies it to the raw request
#: before any lookup, src/index.ts:286-292).
_GUARD_KINDS = 6


@register(
    "fileops_read_guard",
    oracle=f"""
WITH base AS (
  -- pathless docs (NULL source/lang) produce no request on either side
  SELECT doc_id, doc_id % {_GUARD_KINDS} AS kind,
         {_TREE_PATH_SQL.format(str_t="VARCHAR")} AS good,
         n_chars AS size
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
),
verdicts AS (
  -- the guard's expected decision per kind, encoded literally: the
  -- Spark side runs the real segment-fold guard; a regression that
  -- admits any escaping kind (3/4/5) or rejects/mis-normalizes a
  -- benign kind (0/1/2) changes the hashed rows
  SELECT doc_id, kind, size,
         kind <= 2 AS allowed,
         CASE WHEN kind <= 2 THEN good ELSE NULL END AS path
  FROM base
)
SELECT doc_id, kind, allowed, path,
       CASE WHEN allowed THEN size ELSE NULL END AS file_size
FROM verdicts
ORDER BY doc_id
""",
    description="read_file traversal guard (P5) as driver evidence: six"
    " requested-path shapes per doc — three benign (plain, ./-prefixed,"
    " up-and-back detour) normalize and resolve to the file, three"
    " escaping (leading .., absolute, ../../.. breakout) are rejected"
    " with no resolution (reference ensureWithinRoot,"
    " src/indexer.ts:320-338)",
    tags=("fileops", "read_file", "guard"),
)
def fileops_read_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The guard itself is within_root_col's JVM segment fold — the
    oracle hard-codes only the EXPECTED verdicts (ground truth by
    construction), while the hashed Spark rows come from running the
    real guard over adversarial requests and joining the survivors'
    normalized paths back to the file listing for their sizes. Rejected
    requests must yield (allowed=false, path=NULL, file_size=NULL):
    admitting a breakout or resolving a file through an escaping path
    breaks the hash. Guard + join are one codegen stage + one broadcast
    lookup; no Python, no per-row driver calls.

    The oracle's per-kind verdicts assume the fixture's source/lang
    values are plain tokens (no '/', '.', '..' segments) — true of the
    driver's deterministic generator. If a future fixture vintage
    violated that, the driver hash would fail loudly here rather than
    silently pass, which is the right failure mode for a guard."""
    from mcp_rag_server_spark.sources.files import within_root_col

    listing = _doc_file_listing(spark, sf_dir).select(
        F.col("rel_path").alias("listed_path"), "file_size"
    )
    kind = (F.col("doc_id") % _GUARD_KINDS).alias("kind")
    req = (
        F.when(F.col("kind") == 1, F.concat(F.lit("./"), F.col("rel_path")))
        .when(
            F.col("kind") == 2,
            F.regexp_replace("rel_path", "^([^/]+)/", "$1/xx/../"),
        )
        .when(F.col("kind") == 3, F.concat(F.lit("../"), F.col("rel_path")))
        .when(F.col("kind") == 4, F.concat(F.lit("/"), F.col("rel_path")))
        .when(
            F.col("kind") == 5,
            F.concat(F.lit("../../../etc/"), F.col("rel_path")),
        )
        .otherwise(F.col("rel_path"))
    )
    requests = (
        load_table(spark, sf_dir, "documents")
        # pathless docs produce no request — mirrors the oracle's base
        .filter("source IS NOT NULL AND lang IS NOT NULL")
        .selectExpr(
            "doc_id",
            _TREE_PATH_SQL.format(str_t="STRING") + " AS rel_path",
        )
        .select("doc_id", kind, "rel_path")
        .withColumn("req", req)
        .withColumn("verdict", within_root_col(F.col("req")))
    )
    return (
        requests.select(
            "doc_id",
            "kind",
            F.col("verdict.allowed").alias("allowed"),
            F.col("verdict.norm").alias("path"),
        )
        .join(listing, F.col("path") == F.col("listed_path"), "left")
        .select("doc_id", "kind", "allowed", "path", "file_size")
        .orderBy("doc_id")
    )


@register(
    "fileops_list_ext",
    oracle=f"""
WITH files AS (
  SELECT {_TREE_PATH_SQL.format(str_t="VARCHAR")} AS path,
         n_chars AS size
  FROM documents
  WHERE CASE doc_id % 3 WHEN 0 THEN 'txt' WHEN 1 THEN 'md' ELSE 'log' END = 'md'
    AND source IS NOT NULL AND lang IS NOT NULL
)
SELECT path, 'file' AS type, size FROM files ORDER BY type, path LIMIT 100
""",
    description="list_files extension filter: '.md' only, dir rows"
    " suppressed (P7/F7, reference src/index.ts:377-388)",
    tags=("fileops", "catalog", "filter"),
)
def fileops_list_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = file_catalog(_doc_file_listing(spark, sf_dir))
    return list_files(cat, recursive=True, include_extensions=[".MD"], limit=100)


@register(
    "fileops_du_rollup",
    oracle=f"""
WITH files AS (
  SELECT {_TREE_PATH_SQL.format(str_t="VARCHAR")} AS path,
         n_chars AS size
  FROM documents
),
contrib AS (
  SELECT CASE WHEN i = 0 THEN '.'
              ELSE array_to_string(parts[1:CAST(i AS INT)], '/') END
           AS dir_path,
         CAST(i AS INT) AS depth,
         size
  FROM (SELECT string_split(path, '/') AS parts, size FROM files),
       LATERAL (SELECT unnest(generate_series(0, len(parts) - 1)) AS i) t
)
SELECT dir_path, depth,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(size) AS BIGINT) AS total_bytes,
       CAST(MAX(size) AS BIGINT) AS max_file_bytes
FROM contrib
GROUP BY dir_path, depth
ORDER BY dir_path
""",
    description="du -s for the catalog: every file's size contributes"
    " to each ancestor directory via a depth-bounded prefix explode —"
    " per-directory file counts, total and max bytes, the recursive"
    " rollup a file server answers quota and hot-spot questions with",
    tags=("fileops", "catalog", "rollup"),
)
def fileops_du_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive directory totals are an ancestor-explode, not a
    recursion: each file row yields one contribution per path prefix
    (depth-bounded — path depth, not corpus size, bounds the fanout),
    then one group-by on the ancestor path. The '.' row carries the
    whole-tree total. Uses the SAME path expression as
    fileops_list's catalog (source/lang/doc_N.ext), so the rollup is
    consistent with the listing surface; at 100 TB this is the
    standard manifest-side du every object-store layout audit runs —
    a ×depth fanout of the manifest and a single shuffle on the
    directory key."""
    docs = load_table(spark, sf_dir, "documents")
    files = docs.selectExpr(
        _TREE_PATH_SQL.format(str_t="STRING") + " AS path",
        "n_chars AS size",
    )
    contrib = files.selectExpr(
        "explode(sequence(0, size(split(path, '/')) - 1)) AS i",
        "split(path, '/') AS parts",
        "size",
    ).selectExpr(
        "CASE WHEN i = 0 THEN '.' "
        "ELSE array_join(slice(parts, 1, i), '/') END AS dir_path",
        "CAST(i AS INT) AS depth",
        "size",
    )
    return (
        contrib.groupBy("dir_path", "depth")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("size").cast("bigint").alias("total_bytes"),
            F.max("size").cast("bigint").alias("max_file_bytes"),
        )
        .orderBy("dir_path")
    )
