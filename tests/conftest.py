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


def _driver_fidelity_check(spark_df, spark_rows, duck_con, sql: str) -> None:
    """Mimic the driver's pandas-based canonicalizer, which differs from our
    exact-value compare in two ways that burned round 1:

    - DuckDB HUGEINT (e.g. SUM over INTEGER) lands in pandas as float64,
      so an integer-valued column hashes as ``0.0`` vs Spark's ``0``.
      Catch: int-vs-float dtype-kind mismatch between the two frames.
    - pandas ``sort_values`` cannot canonicalize list-typed columns
      (``TypeError: unhashable type: 'list'``). Catch: try the sort.
    """
    import pandas as pd

    duck_pdf = duck_con.execute(sql).df()
    spark_pdf = pd.DataFrame([tuple(r) for r in spark_rows], columns=spark_df.columns)
    for pdf, side in ((spark_pdf, "spark"), (duck_pdf, "duckdb")):
        try:
            pdf.sort_values(by=sorted(pdf.columns))
        except TypeError as exc:  # unhashable column (list/dict) breaks the driver
            raise AssertionError(
                f"{side} result is not canonicalizable by the driver "
                f"(unsortable column): {exc}"
            ) from exc
    if len(spark_pdf) == 0:
        return
    for c in spark_df.columns:
        kinds = {spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind}
        if kinds in ({"i", "f"}, {"u", "f"}):
            raise AssertionError(
                f"driver-visible dtype mismatch on column {c!r}: "
                f"spark={spark_pdf[c].dtype} duckdb={duck_pdf[c].dtype} "
                f"(DuckDB HUGEINT? add CAST(... AS BIGINT) to the oracle)"
            )
        if kinds == {"O", "M"}:
            # DATE-typed oracle outputs become pandas Timestamps while
            # Spark dates stay datetime.date objects — identical values,
            # different driver-side renderings. Emit date strings instead.
            raise AssertionError(
                f"driver-visible date/datetime split on column {c!r}: "
                f"spark={spark_pdf[c].dtype} duckdb={duck_pdf[c].dtype} "
                f"(emit the date as a yyyy-MM-dd string on both sides)"
            )


def compare_spark_duckdb(spark_df, duck_con, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (count, columns, values)."""
    spark_cols = sorted(spark_df.columns)
    spark_rows = spark_df.collect()
    _driver_fidelity_check(spark_df, spark_rows, duck_con, sql)

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
