"""Structured Streaming surface (SURVEY.md §2.9): the reference is
batch-only with restart-time refresh; the Spark-native answer is
readStream → watermark → windowed/sessionized aggregation → sink, plus
foreachBatch MERGE for incremental table maintenance."""
