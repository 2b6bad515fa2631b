"""textanalysis operators (filled in incrementally)."""
