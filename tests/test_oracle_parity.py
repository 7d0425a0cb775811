"""Driver-style correctness gate, run locally at sf0.001: every registered
query with an oracle must match DuckDB on row count, sorted column names,
and canonicalized values."""

from __future__ import annotations

import pytest

from delta_lake_optimizations_spark.registry import registry

from .conftest import SF_DIR, compare_spark_duckdb

_DEFS = registry()
_WITH_ORACLE = sorted(name for name, q in _DEFS.items() if q.oracle is not None)
_ROWS_ONLY = sorted(name for name, q in _DEFS.items() if q.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    qdef = _DEFS[name]
    df = qdef.fn(spark, SF_DIR)
    compare_spark_duckdb(df, duck, qdef.oracle)


@pytest.mark.slow  # schema lint over every registered query; plan construction alone builds ANN indexes
@pytest.mark.parametrize("name", sorted(_DEFS))
def test_no_decimal_output_columns(spark, name):
    """Registry lint (VERDICT r03 #9): the driver's value canonicalizer hashes
    Spark and DuckDB decimal representations differently even for equal
    values, so the convention (registry.py) is sum-in-DECIMAL then
    cast-double + round on BOTH sides. Fail any query whose output schema
    still exposes a DecimalType column."""
    from pyspark.sql.types import DecimalType

    df = _DEFS[name].fn(spark, SF_DIR)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, (
        f"{name} exposes DecimalType column(s) {bad}; cast to double and "
        f"round per the registry convention"
    )


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    qdef = _DEFS[name]
    df = qdef.fn(spark, SF_DIR)
    # Driver's weaker check: runs, stable schema, >= 0 rows.
    assert df.columns
    assert df.count() >= 0
