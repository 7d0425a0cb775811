"""CONVERT TO GRAFT: in-place, zero-copy migration of a bare parquet
directory into a versioned GraftTable (Delta's ``CONVERT TO DELTA``
parity — the onboarding path for existing data lakes).

Nothing is rewritten: the existing parquet files are REGISTERED as
version 0 — the commit lists each file with footer-harvested stats
(min/max/nullCount for data skipping) and hive-parsed partition values.
At 100 TB this is a metadata-only operation: one directory walk plus one
footer read per file (O(KB) each, parallelizable), zero data I/O.
After conversion every engine feature applies: time travel from v0,
OPTIMIZE/Z-order, DELETE/MERGE, bloom sidecars, matviews, CDF.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from delta_lake_optimizations_spark.table.graft_table import Commit, GraftTable


def convert_to_graft(
    spark: SparkSession,
    path: str,
    partition_columns: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> GraftTable:
    """Register the parquet files under ``path`` as a GraftTable v0.

    ``partition_columns`` must name the hive partition directories
    (``country=US/...``) when present — like Delta's CONVERT, the
    partition schema is declared, then validated against what the paths
    actually encode (a mismatch aborts; guessing partition types from
    strings is how converters corrupt tables).
    """
    t = GraftTable(spark, path)
    if t.exists():
        raise ValueError(f"already a GraftTable (has a commit log): {path}")
    if not os.path.isdir(path):
        raise FileNotFoundError(path)

    adds = t._scan_written_files("", properties or {})
    if not adds:
        raise ValueError(f"no parquet files under {path}")

    declared = set(partition_columns or [])
    for a in adds:
        found = set(a.partition_values)
        if found != declared:
            raise ValueError(
                f"partition mismatch for {a.path}: path encodes "
                f"{sorted(found)}, declared {sorted(declared)} — pass "
                "partition_columns matching the hive directory layout"
            )

    # Schema through Spark's own reader (partition discovery types the
    # partition columns consistently with how scans will read them).
    df = spark.read.option("basePath", path).parquet(path)
    metadata = {
        "schemaJson": json.dumps(df.schema.jsonValue()),
        "partitionColumns": list(partition_columns or []),
        "properties": dict(properties or {}),
    }
    t._write_commit(
        "CONVERT",
        {"numFiles": len(adds), "numRecords": sum(a.num_records for a in adds)},
        adds,
        [],
        metadata,
        base_version=-1,
    )
    return t
