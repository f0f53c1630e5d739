"""subqueries queries (filled in incrementally)."""
