"""Ingest sources beyond parquet: explicit-schema CSV and JSONL.

The reference teaches exactly one ingestion lesson (S7/S8): never let the
reader infer — an inferred read costs a full extra scan of the data
before the real one (docs/02-lab-optimizations.md:483-583). Every reader
here therefore takes a ``StructType`` (or defaults to a registered one)
and never infers. CSV helpers live in :mod:`..workshop`; this module adds
the JSONL path the corpus's ``events.props`` payloads suggest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from delta_lake_optimizations_spark.workshop import (
    csv_read_explicit,
    csv_read_inferred,
)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Newline-delimited JSON with an explicit schema — no inference scan;
    malformed lines land in ``_corrupt_record``-free PERMISSIVE nulls."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as newline-delimited JSON (one object per row)."""
    df.write.mode(mode).json(path)


from delta_lake_optimizations_spark.sources.graft_datasource import (
    GraftDataSource,
    register_graft_source,
)
from delta_lake_optimizations_spark.sources.shards import (
    export_tar_shards,
    read_tar_shards,
)

__all__ = [
    "GraftDataSource",
    "csv_read_explicit",
    "csv_read_inferred",
    "export_tar_shards",
    "read_jsonl",
    "read_tar_shards",
    "register_graft_source",
    "write_jsonl",
]
