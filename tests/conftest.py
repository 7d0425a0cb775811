"""Shared fixtures: one SparkSession per test session, DuckDB oracle con,
and the driver-style result comparison."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_optimizations_spark import TABLES, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a value for order-insensitive comparison (mirrors the
    driver's value-hash semantics: exact values, floats as-is post-rounding)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent exactly
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return repr(v)


def compare_spark_duckdb(spark_df, duck_con, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (count, columns, values)."""
    spark_cols = sorted(spark_df.columns)
    spark_rows = spark_df.collect()

    rel = duck_con.execute(sql)
    duck_cols_raw = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    duck_cols = sorted(duck_cols_raw)

    assert spark_cols == duck_cols, f"schema mismatch: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    s_idx = [spark_df.columns.index(c) for c in spark_cols]
    d_idx = [duck_cols_raw.index(c) for c in duck_cols]
    s_canon = sorted(tuple(_canon(r[i]) for i in s_idx) for r in spark_rows)
    d_canon = sorted(tuple(_canon(r[i]) for i in d_idx) for r in duck_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
