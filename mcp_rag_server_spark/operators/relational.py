"""relational operators (filled in incrementally)."""
