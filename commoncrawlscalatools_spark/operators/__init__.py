"""DataFrame-level operators (filters, dedup, similarity, frontier, …)."""
