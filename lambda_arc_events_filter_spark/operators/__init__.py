"""Custom composite operators Spark lacks natively (as-of join, banded
range join, …) — each built from DataFrame primitives so Catalyst still
optimizes the pieces."""
