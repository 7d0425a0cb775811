"""replaceWhere overwrite (Delta parity): atomically replace only the rows
matching the predicate — partition-aligned predicates drop whole files with
zero read amplification, arbitrary predicates rewrite only the mixed files
keeping their non-matching rows, and out-of-predicate incoming rows are
rejected.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table import GraftTable
from delta_lake_optimizations_spark.table.graft_table import ConstraintViolationError


@pytest.fixture()
def t(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("bucket"),
        (F.col("id") * 10).alias("val"),
    )
    t.write(df, partition_by=["bucket"])
    return t


def test_partition_aligned_replace_drops_whole_files(t):
    before = {f.path for f in t.snapshot().files}
    other = {f.path for f in t.snapshot().files if f.partition_values.get("bucket") != "2"}
    fresh = t.spark.range(5).select(
        (F.col("id") + 1000).alias("k"),
        F.lit(2).cast("long").alias("bucket"),
        F.lit(-1).cast("long").alias("val"),
    )
    t.write(fresh, replace_where=[("bucket", "=", 2)])
    snap = t.snapshot()
    after = {f.path for f in snap.files}
    assert other <= after, "unaffected partitions carry over by reference"
    assert not any(p in after for p in before - other), "bucket=2 files dropped"
    df = t.load()
    assert df.filter(F.col("bucket") == 2).count() == 5
    assert df.filter(F.col("bucket") != 2).count() == 75


def test_arbitrary_predicate_keeps_nonmatching_rows(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "u"))
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("val"))
    t.write(df.repartition(4))
    fresh = spark.range(3).select(
        (F.col("id") + 50).alias("k"), F.lit(0).cast("long").alias("val")
    )
    t.write(fresh, replace_where=[("k", ">=", 50), ("k", "<", 53)])
    out = t.load()
    assert out.count() == 100
    assert out.filter((F.col("k") >= 50) & (F.col("k") < 53)).agg(F.sum("val")).first()[0] == 0
    # rows outside the predicate from the SAME files survived the rewrite
    assert out.filter(F.col("k") == 53).first()["val"] == 530


def test_out_of_predicate_rows_rejected(t):
    bad = t.spark.range(2).select(
        F.col("id").alias("k"),
        F.lit(3).cast("long").alias("bucket"),
        F.lit(0).cast("long").alias("val"),
    )
    with pytest.raises(ConstraintViolationError, match="replaceWhere"):
        t.write(bad, replace_where=[("bucket", "=", 2)])


def test_replace_where_is_time_travelable(t):
    v = t.latest_version()
    fresh = t.spark.range(1).select(
        F.lit(999).cast("long").alias("k"),
        F.lit(0).cast("long").alias("bucket"),
        F.lit(0).cast("long").alias("val"),
    )
    t.write(fresh, replace_where=[("bucket", "=", 0)])
    assert t.load(version=v).filter(F.col("bucket") == 0).count() == 25
    assert t.load().filter(F.col("bucket") == 0).count() == 1


def test_replace_where_requires_overwrite_mode(t):
    fresh = t.spark.range(1).select(
        F.lit(1).cast("long").alias("k"),
        F.lit(0).cast("long").alias("bucket"),
        F.lit(0).cast("long").alias("val"),
    )
    with pytest.raises(ValueError, match="replace_where requires"):
        t.write(fresh, mode="append", replace_where=[("bucket", "=", 0)])


def test_null_predicate_rows_survive_rewrite(spark, tmp_path):
    """Regression (ADVICE r03): rows where the predicate evaluates to NULL
    are non-matching — Delta preserves them; filter(~cond) alone would
    silently drop them from rewritten mixed files."""
    t = GraftTable(spark, os.path.join(tmp_path, "nulls"))
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 30), (None, 40), (5, 50)], "k int, val int"
    )
    t.write(df.coalesce(1))  # one mixed file so the rewrite path runs
    fresh = spark.createDataFrame([(2, -1)], "k int, val int")
    t.write(fresh, replace_where=[("k", "=", 2)])
    out = t.load()
    assert out.count() == 5, "NULL-k rows must survive the rewrite"
    assert out.filter(F.col("k").isNull()).count() == 2
    assert out.filter(F.col("k") == 2).first()["val"] == -1


def test_null_predicate_incoming_rows_rejected(spark, tmp_path):
    """Mirror hole: an incoming row with NULL in the predicate column is
    NOT inside the predicate and must be rejected, not slip past ~cond."""
    t = GraftTable(spark, os.path.join(tmp_path, "nulls2"))
    t.write(spark.createDataFrame([(1, 10), (2, 20)], "k int, val int"))
    bad = spark.createDataFrame([(2, -1), (None, -2)], "k int, val int")
    with pytest.raises(ConstraintViolationError, match="outside the replaceWhere"):
        t.write(bad, replace_where=[("k", "=", 2)])
