"""MERGE (upsert) tests: update-only, insert-only, mixed upsert,
matched-delete, file-granular rewrites, and time travel across a merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table import GraftTable
from delta_lake_optimizations_spark.table.merge import merge

from .conftest import SF_DIR


@pytest.fixture()
def target(spark, tmp_path):
    df = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .repartition(8)
    )
    t = GraftTable(spark, str(tmp_path / "cust"))
    t.write(df)
    return t


def test_merge_upsert_updates_and_inserts(spark, target):
    n0 = target.load().count()
    existing = target.load().limit(5).select("c_custkey")
    max_key = target.load().agg(F.max("c_custkey")).collect()[0][0]

    src = (
        existing.withColumn("c_acctbal", F.lit(9999.0))
        .unionByName(
            spark.createDataFrame(
                [(max_key + 1, 9999.0), (max_key + 2, 9999.0)],
                "c_custkey long, c_acctbal double",
            )
        )
    )
    merge(
        target, src, on=["c_custkey"],
        when_matched_update={"c_acctbal": F.col("s_c_acctbal")},
        when_not_matched_insert="*",
    )
    after = target.load()
    assert after.count() == n0 + 2
    assert after.filter(F.col("c_acctbal") == 9999.0).count() == 7
    # non-key columns of updated rows preserved
    assert after.filter(F.col("c_name").isNull()).count() == 2  # only inserts lack names
    assert target.history().collect()[0]["operation"] == "MERGE"


def test_merge_insert_only(spark, target):
    n0 = target.load().count()
    max_key = target.load().agg(F.max("c_custkey")).collect()[0][0]
    src = spark.createDataFrame(
        [(max_key + 10, "new", 1.0, "SEG")],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )
    commit = merge(target, src, on=["c_custkey"], when_matched_update=None)
    assert target.load().count() == n0 + 1
    # no target rows matched -> no target files rewritten
    assert commit.operation_parameters["numTargetFilesRewritten"] == 0
    assert len(commit.remove) == 0


def test_merge_matched_delete(spark, target):
    n0 = target.load().count()
    victims = target.load().limit(10).select("c_custkey")
    merge(
        target, victims, on=["c_custkey"],
        when_matched_delete=True, when_not_matched_insert=None,
    )
    assert target.load().count() == n0 - 10


def test_merge_rewrites_only_hit_files(spark, target):
    one_key = target.load().limit(1).select("c_custkey")
    snap_before = target.snapshot()
    commit = merge(
        target, one_key.withColumn("c_acctbal", F.lit(1.0)), on=["c_custkey"],
        when_matched_update={"c_acctbal": F.col("s_c_acctbal")},
        when_not_matched_insert=None,
    )
    # a single key lives in exactly one of the 8 files
    assert commit.operation_parameters["numTargetFilesRewritten"] == 1
    untouched = {f.path for f in snap_before.files} - set(commit.remove)
    assert untouched <= {f.path for f in target.snapshot().files}


def test_merge_is_time_travelable(spark, target):
    n0 = target.load().count()
    bal0 = target.load().agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0]
    src = target.load().limit(3).select("c_custkey").withColumn("c_acctbal", F.lit(0.0))
    merge(
        target, src, on=["c_custkey"],
        when_matched_update={"c_acctbal": F.col("s_c_acctbal")},
        when_not_matched_insert=None,
    )
    old = target.load(version=0)
    assert old.count() == n0
    assert old.agg(F.round(F.sum("c_acctbal"), 2)).collect()[0][0] == bal0
