"""Corpus sources: file discovery, text/PDF decode, chunk-store ingest,
incremental refresh (the reference's startup build + maintenance path,
re-expressed as Spark batch jobs)."""
