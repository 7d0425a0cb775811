"""Relational query surface (SURVEY.md §2.2, §2.3, §2.8).

Each module registers (PySpark, DuckDB-oracle) pairs into
``delta_lake_optimizations_spark.registry``.
"""
