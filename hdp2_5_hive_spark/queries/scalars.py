"""scalars queries (filled in incrementally)."""
