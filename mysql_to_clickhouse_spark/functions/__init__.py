"""Reusable column-expression helpers (all JVM-side, no Python UDFs)."""
