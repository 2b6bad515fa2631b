"""mcp_rag_server_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Daniel-Barta/mcp-rag-server.

Not a port: the reference (TypeScript, in-memory row array, brute-force
scans — see SURVEY.md) is re-expressed as declarative Spark DataFrame /
SQL plans over Parquet so Catalyst/Tungsten provide pushdown, pruning,
vectorization and shuffle-parallelism at 100 TB scale.

The package root re-exports the reference's user surface so switching
is one import:

- the three MCP tools (reference src/index.ts:165-254) →
  :func:`rag_query` (src/index.ts:260-284), :func:`read_file`
  (src/index.ts:286-314), :func:`list_files` (src/index.ts:316-413);
- the startup build / warm refresh (src/indexer.ts:226-317, 413-511) →
  :func:`build`, :func:`load_store`, :func:`save_store`,
  :func:`compact_store`;
- everything beyond the reference (TPC-H pack, dedup, similarity,
  streaming, text analysis, training prep) is registered in
  :mod:`mcp_rag_server_spark.registry` — ``load_all()`` returns every
  query with its DuckDB oracle twin.
"""

from mcp_rag_server_spark.operators.embed import rag_query_corpus as rag_query
from mcp_rag_server_spark.operators.fileops import (
    file_catalog,
    list_files,
    read_file,
)
from mcp_rag_server_spark.session import get_spark
from mcp_rag_server_spark.sources.ingest import (
    IngestParams,
    build,
    compact_store,
    load_store,
    save_store,
)

__version__ = "0.1.0"

__all__ = [
    "IngestParams",
    "build",
    "compact_store",
    "file_catalog",
    "get_spark",
    "list_files",
    "load_store",
    "rag_query",
    "read_file",
    "save_store",
    "__version__",
]
