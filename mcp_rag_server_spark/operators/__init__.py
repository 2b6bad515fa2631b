"""Operator library — each module registers its queries with
mcp_rag_server_spark.registry and exposes plain Python APIs for
programmatic use."""
