"""Bucketed (co-located) joins: pre-shuffle once, join shuffle-free forever.

The 100 TB pattern the reference alludes to via CBO join planning
(docs/02-lab-optimizations.md:783 "broadcast hint usage, shuffle
optimization"): when two big fact tables are repeatedly joined on the same
key, write both bucketed by that key (``bucketBy`` + ``saveAsTable``).
Spark records the bucketing in the catalog; later joins on the bucket key
skip BOTH sides' shuffles — the dominant cost of a fact-fact join.

``spark.sql.sources.bucketing.enabled`` is on by default; bucket counts
must match on both sides for shuffle elimination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the sort from sort-merge
    joins (bucketed + sorted join = zero shuffle, zero sort).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def joined_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
