"""Reusable column-expression and DataFrame-level function library."""
