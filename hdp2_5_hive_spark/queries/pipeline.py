"""pipeline queries (filled in incrementally)."""
