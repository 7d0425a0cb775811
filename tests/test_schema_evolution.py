"""merge_schema append evolution: new columns null-fill historical files
(read-side, no rewrite), missing columns null-fill new rows, type changes
are rejected, and both the native scan and the 'graft' data source see
the evolved schema — on flat and hive-partitioned tables."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from delta_lake_optimizations_spark.sources.graft_datasource import (
    register_graft_source,
)
from delta_lake_optimizations_spark.table.graft_table import GraftTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(0, 10).select("id", (F.col("id") * 2.0).alias("v")),
        mode="overwrite",
    )
    return t


def test_append_new_column_nullfills_history(spark, tbl):
    newer = spark.range(10, 15).select(
        "id", (F.col("id") * 2.0).alias("v"), F.lit("fresh").alias("tag")
    )
    tbl.write(newer, mode="append", merge_schema=True)
    out = tbl.load()
    assert [f.name for f in out.schema.fields] == ["id", "v", "tag"]
    assert out.count() == 15
    assert out.filter("tag IS NULL").count() == 10
    assert out.filter("tag = 'fresh'").count() == 5


def test_append_missing_column_nullfills_new_rows(spark, tbl):
    tbl.write(spark.range(100, 103).select("id"), mode="append", merge_schema=True)
    out = tbl.load()
    assert out.filter("v IS NULL").count() == 3
    assert out.count() == 13


def test_type_change_rejected(spark, tbl):
    bad = spark.range(0, 3).select("id", F.lit("oops").alias("v"))
    with pytest.raises(ValueError, match="merge_schema cannot change column 'v'"):
        tbl.write(bad, mode="append", merge_schema=True)


def test_strict_append_still_rejects_new_columns(spark, tbl):
    extra = spark.range(0, 3).select("id", F.lit(1.0).alias("v"), F.lit("x").alias("n"))
    with pytest.raises(ValueError, match="schema mismatch"):
        tbl.write(extra, mode="append")


def test_partitioned_evolution_roundtrip(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "p"))
    old = spark.createDataFrame([Row(id=i, part="a" if i % 2 else "b") for i in range(8)])
    t.write(old, mode="overwrite", partition_by=["part"])
    newer = spark.createDataFrame([Row(id=100, part="a", score=0.5)])
    t.write(newer, mode="append", merge_schema=True)
    out = t.load()
    assert set(out.columns) == {"id", "part", "score"}
    assert out.count() == 9
    assert out.filter("score IS NULL").count() == 8
    assert out.filter("part = 'a'").count() == 5


def test_graft_source_reads_evolved_table(spark, tbl):
    register_graft_source(spark)
    tbl.write(
        spark.range(10, 12).select("id", (F.col("id") * 2.0).alias("v"), F.lit(7).alias("k")),
        mode="append",
        merge_schema=True,
    )
    native = tbl.load()
    via_source = spark.read.format("graft").option("path", tbl.path).load()
    assert via_source.schema == native.schema
    assert sorted(map(tuple, via_source.collect())) == sorted(map(tuple, native.collect()))


def test_time_travel_sees_pre_evolution_schema(spark, tbl):
    v0 = tbl.latest_version()
    tbl.write(
        spark.range(20, 22).select("id", (F.col("id") * 2.0).alias("v"), F.lit("t").alias("tag")),
        mode="append",
        merge_schema=True,
    )
    assert [f.name for f in tbl.load(version=v0).schema.fields] == ["id", "v"]
    assert [f.name for f in tbl.load().schema.fields] == ["id", "v", "tag"]
