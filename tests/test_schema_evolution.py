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


# ---------------------------------------------------------------------------
# Column DEFAULT values (Delta allowColumnDefaults parity)


def test_default_fills_omitted_column_on_append(spark, tbl):
    tbl.set_column_default("v", "42.5")
    tbl.write(spark.range(10, 13).select("id"), mode="append")
    out = tbl.load()
    assert out.count() == 13
    assert out.filter("v = 42.5").count() == 3
    # never retroactive: historical rows keep their written values
    assert out.filter("id < 10 AND v = 2 * id").count() == 10


def test_default_not_applied_to_explicit_null(spark, tbl):
    tbl.set_column_default("v", "42.5")
    explicit = spark.range(20, 22).select("id", F.lit(None).cast("double").alias("v"))
    tbl.write(explicit, mode="append")
    assert tbl.load().filter("id >= 20 AND v IS NULL").count() == 2


def test_default_expression_and_cast(spark, tbl):
    # constant-foldable expression, cast to the declared column type
    tbl.set_column_default("v", "CAST(40 AS INT) + 2")
    tbl.write(spark.range(30, 31).select("id"), mode="append")
    assert tbl.load().filter("id = 30 AND v = 42.0").count() == 1
    assert dict(tbl.load().dtypes)["v"] == "double"


def test_drop_default_restores_nullfill(spark, tbl):
    tbl.set_column_default("v", "1.0")
    tbl.drop_column_default("v")
    # with the default gone, an omitting append is a plain schema-evolution
    # append again: null-fill needs merge_schema, strict mode rejects it
    tbl.write(spark.range(40, 42).select("id"), mode="append", merge_schema=True)
    assert tbl.load().filter("id >= 40 AND v IS NULL").count() == 2
    with pytest.raises(ValueError, match="has no DEFAULT"):
        tbl.drop_column_default("v")


def test_default_rejects_column_references_and_bad_casts(spark, tbl):
    with pytest.raises(ValueError, match="constant-foldable"):
        tbl.set_column_default("v", "id + 1")  # references a column
    with pytest.raises(ValueError, match="no such column"):
        tbl.set_column_default("nope", "1")


def test_default_refused_on_generated_column(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "gen"))
    t.write(
        spark.range(0, 5).select("id", (F.col("id") % 3).alias("bucket")),
        mode="overwrite",
        properties={"graft.generated.bucket": "id % 3"},
    )
    with pytest.raises(ValueError, match="generated/identity"):
        t.set_column_default("bucket", "0")


def test_rename_refused_while_default_set(spark, tbl):
    tbl.set_column_default("v", "1.0")
    with pytest.raises(ValueError, match="referenced by property"):
        tbl.rename_column("v", "w")
    tbl.drop_column_default("v")
    tbl.rename_column("v", "w")  # allowed once the default is gone
    assert "w" in tbl.load().columns


def test_add_column_then_default_via_sql(spark, tmp_path):
    """End-to-end through the SQL front door: ADD COLUMN, SET DEFAULT,
    append omitting the column, DROP DEFAULT."""
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    cat = GraftCatalog(spark)
    df = spark.range(0, 4).select("id")
    cat.create("ev", df, str(tmp_path / "ev"))
    cat.sql("ALTER TABLE ev ADD COLUMN note STRING")
    cat.sql("ALTER TABLE ev ALTER COLUMN note SET DEFAULT 'n/a'")
    t = cat.table("ev")
    t.write(spark.range(4, 6).select("id"), mode="append")
    out = t.load()
    assert out.filter("note = 'n/a'").count() == 2
    assert out.filter("note IS NULL").count() == 4  # pre-default history
    cat.sql("ALTER TABLE ev ALTER COLUMN note DROP DEFAULT")
    t.write(spark.range(6, 7).select("id"), mode="append", merge_schema=True)
    assert cat.table("ev").load().filter("id = 6 AND note IS NULL").count() == 1
