"""Vectorized scalar-function surface (SURVEY.md §2.6).

Every geometry/cell kernel exists in up to three consistent forms:
- a Spark ``Column`` expression (JVM-side, whole-stage codegen),
- a NumPy kernel (for Arrow/pandas UDF paths),
- a SQL snippet (DuckDB-compatible, for oracle verification).
"""
