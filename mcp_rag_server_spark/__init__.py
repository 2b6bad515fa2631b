"""mcp_rag_server_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Daniel-Barta/mcp-rag-server.

Not a port: the reference (TypeScript, in-memory row array, brute-force
scans — see SURVEY.md) is re-expressed as declarative Spark DataFrame /
SQL plans over Parquet so Catalyst/Tungsten provide pushdown, pruning,
vectorization and shuffle-parallelism at 100 TB scale.
"""

from mcp_rag_server_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
