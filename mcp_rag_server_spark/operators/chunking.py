"""chunking operators (filled in incrementally)."""
