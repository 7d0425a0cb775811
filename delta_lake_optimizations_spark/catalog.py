"""Table registry over the driver corpus parquet files.

The test corpus (TESTDATA.md) is one parquet file per table under an
``sf*/`` directory. ``register_tables`` creates temp views so both the
DataFrame and ``spark.sql`` entry styles work (reference entry styles 1-3,
SURVEY.md §3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark 4 cannot map to a
# native type (PARQUET_TYPE_ILLEGAL). With nanosAsLong they arrive as BIGINT
# nanoseconds; we truncate to microseconds — exactly what DuckDB does when it
# reads the same file, so oracle comparisons agree.
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Driver-owned sessions may not pin a timezone; epoch arithmetic on
    # TIMESTAMP_NTZ columns (temporal.epoch_seconds) interprets the wall
    # clock in the session zone, so pin UTC to match DuckDB's epoch().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if isinstance(df.schema[col].dataType, T.LongType):
            # Integral `div` — float division would lose precision on
            # ~1.7e18 nanosecond values (> 2^53).
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each corpus table as a temp view; return name -> DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
