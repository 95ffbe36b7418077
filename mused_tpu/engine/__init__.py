"""Pipeline engines (streaming + batch)."""
