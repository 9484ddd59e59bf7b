"""Column-expression helpers (scalar / array / vector functions)."""
