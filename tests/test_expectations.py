"""DLT-style expectations: warn records violation counts in the commit,
drop filters violating rows out of the batch, fail rejects the write;
NULL results violate expectations but pass CHECK constraints; all rules
are counted in one aggregate pass."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table.graft_table import (
    ConstraintViolationError,
    GraftTable,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(0, 5).select("id", (F.col("id") * 10.0).alias("score")),
        mode="overwrite",
    )
    return t


def _last_params(t: GraftTable) -> dict:
    row = t.history().orderBy(F.desc("version")).first()
    return json.loads(row["operationParameters"])


def batch(spark, vals):
    """(id, score) rows; score may be None."""
    return spark.createDataFrame(
        [(int(i), float(s) if s is not None else None) for i, s in vals],
        "id long, score double",
    )


def test_warn_records_counts_keeps_rows(spark, tbl):
    tbl.add_expectation("score_pos", "score > 0", action="warn")
    tbl.write(batch(spark, [(100, 5.0), (101, -1.0), (102, None)]), mode="append")
    assert tbl.load().count() == 8  # nothing dropped
    p = _last_params(tbl)
    # -1.0 violates; NULL violates (expectation semantics)
    assert p["expectations"]["score_pos"] == {"action": "warn", "violations": 2}


def test_drop_filters_violations_records_count(spark, tbl):
    tbl.add_expectation("score_pos", "score > 0", action="drop")
    tbl.write(batch(spark, [(100, 5.0), (101, -1.0), (102, None)]), mode="append")
    out = tbl.load()
    assert out.count() == 6
    assert out.filter("id = 100").count() == 1
    assert out.filter("id IN (101, 102)").count() == 0
    assert _last_params(tbl)["expectations"]["score_pos"]["violations"] == 2


def test_fail_rejects_whole_write(spark, tbl):
    tbl.add_expectation("score_pos", "score > 0", action="fail")
    with pytest.raises(ConstraintViolationError, match="expect_or_fail"):
        tbl.write(batch(spark, [(100, 5.0), (101, -1.0)]), mode="append")
    assert tbl.load().count() == 5
    # a clean batch passes
    tbl.write(batch(spark, [(100, 5.0)]), mode="append")
    assert tbl.load().count() == 6


def test_null_passes_check_but_fails_expectation(spark, tmp_path):
    """The NULL-semantics split: SQL CHECK passes NULL, expectations don't."""
    t = GraftTable(spark, str(tmp_path / "n"))
    t.write(
        batch(__import__("pyspark").sql.SparkSession.active(), [(0, 1.0)]),
        mode="overwrite",
    )
    t.add_constraint("c", "score > 0")
    t.write(batch(t.spark, [(1, None)]), mode="append")  # CHECK: NULL passes
    assert t.load().count() == 2
    t.add_expectation("e", "score > 0", action="drop")
    t.write(batch(t.spark, [(2, None), (3, 4.0)]), mode="append")
    out = t.load()
    assert out.filter("id = 2").count() == 0  # expectation: NULL dropped
    assert out.filter("id = 3").count() == 1


def test_constraint_and_expectation_one_write(spark, tbl):
    tbl.add_constraint("id_pos", "id >= 0")
    tbl.add_expectation("score_cap", "score <= 100", action="drop")
    tbl.write(batch(spark, [(200, 50.0), (201, 500.0)]), mode="append")
    out = tbl.load()
    assert out.filter("id = 200").count() == 1
    assert out.filter("id = 201").count() == 0
    with pytest.raises(ConstraintViolationError, match="CHECK constraint"):
        tbl.write(batch(spark, [(-1, 1.0)]), mode="append")


def test_readd_replaces_action(spark, tbl):
    tbl.add_expectation("g", "score > 0", action="warn")
    tbl.add_expectation("g", "score > 0", action="drop")
    props = tbl.snapshot().properties
    assert "graft.expect.drop.g" in props
    assert "graft.expect.warn.g" not in props


def test_drop_expectation(spark, tbl):
    tbl.add_expectation("g", "score > 0", action="drop")
    tbl.drop_expectation("g")
    tbl.write(batch(spark, [(300, -5.0)]), mode="append")  # gate is gone
    assert tbl.load().filter("id = 300").count() == 1
    with pytest.raises(ValueError, match="no expectation"):
        tbl.drop_expectation("g")


def test_add_expectation_validates_expression(spark, tbl):
    with pytest.raises(Exception, match="nope|UNRESOLVED"):
        tbl.add_expectation("bad", "nope > 0")
    with pytest.raises(ValueError, match="warn\\|drop\\|fail"):
        tbl.add_expectation("g", "score > 0", action="quarantine")


def test_rename_refused_while_expectation_references(spark, tbl):
    tbl.add_expectation("g", "score > 0", action="warn")
    with pytest.raises(ValueError, match="referenced by property"):
        tbl.rename_column("score", "s2")
    tbl.drop_expectation("g")
    tbl.rename_column("score", "s2")
    assert "s2" in tbl.load().columns
