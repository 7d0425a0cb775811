"""delta_lake_optimizations_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities taught by the reference
workshop ``memomsft/delta-lake-optimizations`` (Delta Lake table maintenance:
OPTIMIZE / Z-Order / V-Order / VACUUM / time travel / history / partitioning /
caching / explicit schemas / automated statistics), built on vanilla
PySpark 4 over Parquet — no delta-spark dependency — plus the relational and
LLM-data-pipeline operator surface required for large-scale training-data
work (dedup, similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md §4):
- DataFrame/SQL first: Catalyst + Tungsten pick the physical plan.
- The versioned table (``GraftTable``) is Parquet data files plus a
  ``_log/`` of JSON commits we write ourselves — same shape as the Delta
  transaction log described at reference ``docs/00-overview.md:10``.
- No custom Catalyst rules: file-level skipping is applied driver-side by
  filtering the snapshot file list against per-file min/max stats.
"""

from delta_lake_optimizations_spark.session import get_spark
from delta_lake_optimizations_spark.catalog import register_tables, TABLES

__all__ = ["get_spark", "register_tables", "TABLES"]

__version__ = "0.1.0"
