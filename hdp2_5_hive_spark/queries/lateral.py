"""lateral queries (filled in incrementally)."""
