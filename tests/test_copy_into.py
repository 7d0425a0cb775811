"""COPY INTO: idempotent file-level ingest — re-runs are no-ops, new
landing files load incrementally, force re-ingests, source columns match
the table by name with declared-type casts, and the SQL front door
routes the full verb."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.frontdoor import GraftCatalog
from delta_lake_optimizations_spark.table.copy_into import copy_into, loaded_files
from delta_lake_optimizations_spark.table.graft_table import GraftTable


@pytest.fixture()
def landing(spark, tmp_path):
    """A landing dir with 3 parquet part-files of (id, v)."""
    d = str(tmp_path / "landing")
    spark.range(0, 30).select(
        "id", (F.col("id") * 2.0).alias("v")
    ).repartition(3).write.parquet(d)
    return d


@pytest.fixture()
def tbl(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(100, 105).select("id", (F.col("id") * 2.0).alias("v")),
        mode="overwrite",
    )
    return t


def test_copy_into_loads_then_noops(spark, tbl, landing):
    res = copy_into(tbl, landing)
    assert res["num_files"] == 3 and res["num_rows"] == 30
    assert tbl.load().count() == 35
    assert len(loaded_files(tbl)) == 3
    # blind re-run: nothing loads, no new commit
    v = tbl.snapshot().version
    again = copy_into(tbl, landing)
    assert again == {
        "version": v, "num_files": 0, "num_rows": 0, "skipped_files": 3,
    }
    assert tbl.load().count() == 35


def test_copy_into_picks_up_only_new_files(spark, tbl, landing):
    copy_into(tbl, landing)
    spark.range(500, 510).select(
        "id", (F.col("id") * 2.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(landing)
    res = copy_into(tbl, landing)
    assert res["num_files"] == 1 and res["num_rows"] == 10
    assert res["skipped_files"] == 3
    assert tbl.load().count() == 45
    assert tbl.load().filter("id >= 500").count() == 10


def test_copy_into_force_reingests(spark, tbl, landing):
    copy_into(tbl, landing)
    res = copy_into(tbl, landing, force=True)
    assert res["num_files"] == 3
    assert tbl.load().count() == 65  # duplicates, by request


def test_copy_into_matches_columns_by_name_and_casts(spark, tbl, tmp_path):
    d = str(tmp_path / "narrow")
    # reversed column order + narrower types than the table's (long, double)
    spark.range(200, 203).select(
        (F.col("id") * 2).cast("float").alias("v"),
        F.col("id").cast("int").alias("id"),
    ).coalesce(1).write.parquet(d)
    copy_into(tbl, d)
    out = tbl.load()
    assert dict(out.dtypes) == {"id": "bigint", "v": "double"}
    assert out.filter("id = 201 AND v = 402.0").count() == 1


def test_copy_into_rejects_column_mismatch(spark, tbl, tmp_path):
    d = str(tmp_path / "bad")
    spark.range(3).select("id", F.lit(1.0).alias("v"), F.lit("x").alias("extra")) \
        .coalesce(1).write.parquet(d)
    with pytest.raises(ValueError, match="extra=\\['extra'\\]"):
        copy_into(tbl, d)
    assert tbl.load().count() == 5  # nothing committed


def test_copy_into_pattern_filters_listing(spark, tbl, landing):
    names = sorted(
        f for f in __import__("os").listdir(landing) if f.endswith(".parquet")
    )
    res = copy_into(tbl, landing, pattern=names[0])
    assert res["num_files"] == 1
    # the other two are NOT marked loaded — a later unfiltered run gets them
    res2 = copy_into(tbl, landing)
    assert res2["num_files"] == 2 and res2["skipped_files"] == 1


def test_copy_into_creates_missing_table(spark, tmp_path, landing):
    t = GraftTable(spark, str(tmp_path / "fresh"))
    res = copy_into(t, landing)
    assert res["num_files"] == 3
    assert t.load().count() == 30


def test_copy_into_csv_via_sql_front_door(spark, tmp_path):
    cat = GraftCatalog(spark)
    t = cat.create(
        "ct",
        spark.range(0, 2).select("id", F.lit("seed").alias("name")),
        str(tmp_path / "ct"),
    )
    d = tmp_path / "csvland"
    d.mkdir()
    (d / "batch1.csv").write_text("id,name\n10,alpha\n11,beta\n")
    out = cat.sql(
        f"COPY INTO ct FROM '{d}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header'='true') "
    ).first()
    assert out["num_files"] == 1 and out["num_rows"] == 2
    assert cat.table("ct").load().filter("name = 'beta'").count() == 1
    # idempotent through SQL too
    out2 = cat.sql(
        f"COPY INTO ct FROM '{d}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header'='true') "
    ).first()
    assert out2["num_files"] == 0 and out2["skipped_files"] == 1
    # COPY_OPTIONS force re-ingests
    out3 = cat.sql(
        f"COPY INTO ct FROM '{d}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header'='true') COPY_OPTIONS ('force'='true')"
    ).first()
    assert out3["num_files"] == 1
    assert cat.table("ct").load().count() == 6
