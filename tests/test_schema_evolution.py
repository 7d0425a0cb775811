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


# ---------------------------------------------------------------------------
# Type widening (Delta enableTypeWidening parity)


@pytest.fixture()
def wtbl(spark, tmp_path):
    """int + float + decimal columns, widening enabled."""
    t = GraftTable(spark, str(tmp_path / "w"))
    t.write(
        spark.range(0, 10).select(
            F.col("id").cast("int").alias("i"),
            (F.col("id") * 1.5).cast("float").alias("f"),
            F.col("id").cast("decimal(5,2)").alias("d"),
        ),
        mode="overwrite",
        properties={"delta.enableTypeWidening": "true"},
    )
    return t


def test_widen_column_type_metadata_only(spark, wtbl):
    files_before = {f.path for f in wtbl.snapshot().files}
    wtbl.widen_column_type("i", "bigint")
    wtbl.widen_column_type("f", "double")
    wtbl.widen_column_type("d", "decimal(10,4)")
    snap = wtbl.snapshot()
    assert {f.path for f in snap.files} == files_before  # no rewrite
    out = wtbl.load()
    assert dict(out.dtypes) == {"i": "bigint", "f": "double", "d": "decimal(10,4)"}
    # historical (narrow-on-disk) values read correctly under the wide schema
    assert out.filter("i = 7").count() == 1
    assert abs(out.filter("i = 4").first()["f"] - 6.0) < 1e-9


def test_widen_then_append_wide_values(spark, wtbl):
    wtbl.widen_column_type("i", "bigint")
    wtbl.widen_column_type("f", "double")
    big = 2**40
    wtbl.write(
        spark.range(1).select(
            F.lit(big).cast("bigint").alias("i"),
            F.lit(1.25).alias("f"),
            F.lit(None).cast("decimal(5,2)").alias("d"),
        ),
        mode="append",
    )
    out = wtbl.load()
    assert out.count() == 11
    assert out.filter(f"i = {big}").count() == 1


def test_widen_requires_property_gate(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "nogate"))
    t.write(spark.range(3).select(F.col("id").cast("int").alias("i")), mode="overwrite")
    with pytest.raises(ValueError, match="enableTypeWidening"):
        t.widen_column_type("i", "bigint")


def test_widen_rejects_narrowing_and_lossy(spark, wtbl):
    with pytest.raises(ValueError, match="not a widening promotion"):
        wtbl.widen_column_type("i", "string")  # not in the scan-native matrix
    wtbl.widen_column_type("i", "bigint")
    with pytest.raises(ValueError, match="not a widening promotion"):
        wtbl.widen_column_type("i", "int")  # narrowing
    with pytest.raises(ValueError, match="not a widening promotion"):
        wtbl.widen_column_type("d", "decimal(6,4)")  # loses integer digits


def test_widen_refused_on_partition_column(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "p"))
    t.write(
        spark.range(6).select(
            F.col("id").cast("int").alias("i"), (F.col("id") % 2).alias("p")
        ),
        mode="overwrite",
        partition_by=["p"],
        properties={"delta.enableTypeWidening": "true"},
    )
    with pytest.raises(ValueError, match="partition column"):
        t.widen_column_type("p", "bigint")


def test_time_travel_sees_narrow_schema(spark, wtbl):
    v0 = wtbl.snapshot().version
    wtbl.widen_column_type("i", "bigint")
    assert dict(wtbl.load(version=v0).dtypes)["i"] == "int"
    assert dict(wtbl.load().dtypes)["i"] == "bigint"


def test_merge_schema_auto_widens_under_gate(spark, wtbl):
    """A merge_schema append whose batch carries a WIDER type promotes the
    column (gate on), and historical files still read."""
    wtbl.write(
        spark.range(100, 103).select(
            F.col("id").alias("i"),  # bigint batch into int column
            F.lit(0.5).alias("f"),   # double batch into float column
            F.col("id").cast("decimal(5,2)").alias("d"),
        ),
        mode="append",
        merge_schema=True,
    )
    out = wtbl.load()
    assert dict(out.dtypes)["i"] == "bigint"
    assert dict(out.dtypes)["f"] == "double"
    assert out.count() == 13
    assert out.filter("i = 101").count() == 1
    assert out.filter("i = 5").count() == 1  # historical row


def test_merge_schema_upcasts_narrow_batch_without_gate(spark, tbl):
    """A batch carrying a NARROWER type upcasts into the table type; the
    table schema never narrows and no gate is needed."""
    tbl.write(
        spark.range(50, 52).select(
            "id", F.lit(7).cast("int").alias("v")  # int batch into double col
        ),
        mode="append",
        merge_schema=True,
    )
    out = tbl.load()
    assert dict(out.dtypes)["v"] == "double"
    assert out.filter("id >= 50 AND v = 7.0").count() == 2


def test_merge_schema_widening_refused_without_gate(spark, tbl):
    """tbl has no enableTypeWidening property: a wider batch is rejected
    with a hint naming the gate."""
    bad = spark.range(0, 2).select(F.col("id").cast("decimal(20,1)").alias("id"),
                                   (F.col("id") * 2.0).alias("v"))
    with pytest.raises(ValueError, match="enableTypeWidening"):
        tbl.write(bad, mode="append", merge_schema=True)


def test_widen_via_sql_front_door(spark, tmp_path):
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    cat = GraftCatalog(spark)
    df = spark.range(0, 4).select(F.col("id").cast("int").alias("i"))
    cat.create("wt", df, str(tmp_path / "wt"))
    cat.sql("ALTER TABLE wt SET TBLPROPERTIES ('delta.enableTypeWidening'='true')")
    cat.sql("ALTER TABLE wt ALTER COLUMN i TYPE bigint")
    assert dict(cat.table("wt").load().dtypes)["i"] == "bigint"
    hist = cat.table("wt").history()
    ops = [r["operation"] for r in hist.collect()]
    assert "ALTER COLUMN TYPE" in ops
