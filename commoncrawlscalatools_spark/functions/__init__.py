"""Column-level function library (native Catalyst expressions first)."""
