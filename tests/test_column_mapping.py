"""Column mapping (Delta columnMapping.mode=name parity): RENAME COLUMN and
DROP COLUMN are metadata-only commits — zero data files rewritten — with
reads, appends, data skipping, partition pruning, and time travel all
working across the rename boundary.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.frontdoor import GraftCatalog
from delta_lake_optimizations_spark.table import GraftTable


@pytest.fixture()
def t(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("grp"),
        (F.col("id") * 2).alias("val"),
    )
    t.write(df.repartition(4))
    return t


def _paths(t):
    return sorted(f.path for f in t.snapshot().files)


def test_rename_is_metadata_only_and_reads_back(t):
    before = _paths(t)
    t.rename_column("val", "value")
    assert _paths(t) == before, "rename must not rewrite any data file"
    df = t.load()
    assert "value" in df.columns and "val" not in df.columns
    assert df.agg(F.sum("value")).first()[0] == sum(2 * i for i in range(100))


def test_append_after_rename_uses_logical_names(t):
    t.rename_column("val", "value")
    extra = t.spark.range(100, 110).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("grp"),
        (F.col("id") * 2).alias("value"),
    )
    t.write(extra, mode="append")
    df = t.load()
    assert df.count() == 110
    # every file on disk carries the PHYSICAL name — scans stay uniform
    assert df.filter(F.col("value") == 218).count() == 1


def test_skipping_prunes_on_renamed_column(t):
    from delta_lake_optimizations_spark.table import optimize

    t.rename_column("k", "key")
    optimize(t, zorder_by=["key"], target_files=4)
    all_files = len(t.snapshot().files)
    pruned = t.files_scanned(skip_where=[("key", "<", 10)])
    assert pruned < all_files, "footer-stat skipping must survive the rename"
    assert t.load(skip_where=[("key", "<", 10)]).count() == 10


def test_rename_partition_column(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "p"))
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("bucket")
    )
    t.write(df, partition_by=["bucket"])
    t.rename_column("bucket", "shard")
    assert t.snapshot().partition_columns == ["shard"]
    assert t.files_scanned(skip_where=[("shard", "=", 2)]) < len(t.snapshot().files)
    assert t.load(skip_where=[("shard", "=", 2)]).count() == 25
    # append still lands under the physical hive dir name
    t.write(
        spark.range(100, 104).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("shard")
        ),
        mode="append",
    )
    assert t.load().count() == 104


def test_drop_column_prunes_without_rewrite(t):
    before = _paths(t)
    t.drop_column("val")
    assert _paths(t) == before, "drop must not rewrite any data file"
    df = t.load()
    assert "val" not in df.columns
    assert df.count() == 100


def test_time_travel_sees_pre_rename_schema(t):
    v = t.latest_version()
    t.rename_column("val", "value")
    old = t.load(version=v)
    assert "val" in old.columns and "value" not in old.columns
    assert "value" in t.load().columns


def test_rename_refused_when_constraint_references(t):
    t.add_constraint("positive_val", "val >= 0")
    with pytest.raises(ValueError, match="referenced by property"):
        t.rename_column("val", "value")
    t.drop_constraint("positive_val")
    t.rename_column("val", "value")  # now fine


def test_sql_routes_rename_and_drop(spark, tmp_path, t):
    door = GraftCatalog(spark)
    door.register("tbl", t.path)
    door.sql("ALTER TABLE tbl RENAME COLUMN val TO value")
    assert "value" in door.table("tbl").load().columns
    door.sql("ALTER TABLE tbl DROP COLUMN grp")
    cols = door.table("tbl").load().columns
    assert "grp" not in cols and {"k", "value"} <= set(cols)


def test_optimize_where_on_renamed_partition_column(spark, tmp_path):
    from delta_lake_optimizations_spark.table import optimize

    t = GraftTable(spark, os.path.join(tmp_path, "ow"))
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
    )
    t.write(df.repartition(6), partition_by=["bucket"])
    t.rename_column("bucket", "shard")
    before = len(t.snapshot().files)
    optimize(t, where={"shard": "0"}, target_files=1)
    snap = t.snapshot()
    # only the shard=0 partition was compacted; shard=1 files untouched
    zero = [f for f in snap.files if f.partition_values.get("bucket") == "0"]
    one = [f for f in snap.files if f.partition_values.get("bucket") == "1"]
    assert len(zero) == 1 and len(one) > 1 and before > len(snap.files)
    assert t.load().count() == 200
