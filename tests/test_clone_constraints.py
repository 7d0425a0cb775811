"""CLONE, version-diff change feed, and CHECK-constraint tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table import GraftTable, delete, optimize
from delta_lake_optimizations_spark.table.clone import clone, diff_versions
from delta_lake_optimizations_spark.table.graft_table import ConstraintViolationError

from .conftest import SF_DIR


@pytest.fixture()
def src(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/supplier.parquet").repartition(4)
    t = GraftTable(spark, str(tmp_path / "src"))
    t.write(df)
    return t


def test_shallow_clone_zero_copy(spark, src, tmp_path):
    c = clone(src, str(tmp_path / "shallow"))
    assert c.load().count() == src.load().count()
    # zero data copied: no data/ dir of its own
    import os

    assert not any(
        fn.endswith(".parquet")
        for _, _, fns in os.walk(str(tmp_path / "shallow"))
        for fn in fns
    )
    # clone is independent: deleting in the clone leaves the source intact
    delete(c, "s_suppkey % 2 = 0")
    assert src.load().filter("s_suppkey % 2 = 0").count() > 0
    assert c.load().filter("s_suppkey % 2 = 0").count() == 0


def test_deep_clone_and_historical_version(spark, src, tmp_path):
    n0 = src.load().count()
    delete(src, "s_suppkey % 2 = 0")
    c = clone(src, str(tmp_path / "deep"), shallow=False, version=0)
    assert c.load().count() == n0
    # fully independent files
    delete(src, "s_acctbal > 1000")
    assert c.load().count() == n0


def test_shallow_clone_partitioned(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    t = GraftTable(spark, str(tmp_path / "p_src"))
    t.write(df, partition_by=["o_year"])
    c = clone(t, str(tmp_path / "p_clone"))
    assert c.load().count() == t.load().count()
    assert "o_year" in c.load().columns


def test_diff_versions_change_feed(spark, src):
    n0 = src.load().count()
    delete(src, "s_suppkey % 2 = 0")
    n_deleted = n0 - src.load().count()
    assert n_deleted > 0

    changes = diff_versions(src, 0)
    assert changes.filter(F.col("_change_type") == "delete").count() == n_deleted
    assert changes.filter(F.col("_change_type") == "insert").count() == 0

    # OPTIMIZE rewrites every file but changes no rows -> empty diff
    v_before = src.latest_version()
    optimize(src, target_file_mb=512)
    assert diff_versions(src, v_before).count() == 0


def test_check_constraint_enforced(spark, src):
    src.add_constraint("positive_key", "s_suppkey >= 0")
    ok = src.load().limit(3)
    src.write(ok, mode="append")  # satisfies the constraint

    bad = src.load().limit(2).withColumn("s_suppkey", F.lit(-5).cast("long"))
    with pytest.raises(ConstraintViolationError, match="positive_key"):
        src.write(bad, mode="append")

    # constraint that existing data violates cannot be added
    with pytest.raises(ConstraintViolationError, match="existing"):
        src.add_constraint("impossible", "s_acctbal > 1e12")

    src.drop_constraint("positive_key")
    src.write(bad, mode="append")  # now allowed
    assert src.load().filter("s_suppkey = -5").count() == 2


def test_vacuum_on_shallow_clone_never_touches_source(spark, src, tmp_path):
    from delta_lake_optimizations_spark.table import optimize, vacuum

    c = clone(src, str(tmp_path / "cl"))
    # rewrite everything inside the clone, tombstoning the source-referenced
    # files in the CLONE's log
    optimize(c, target_file_mb=512)
    removed = vacuum(c, retain_hours=0)
    # the source's files must not be deletion candidates
    import os
    for p in removed:
        assert os.path.abspath(os.path.join(c.path, p)).startswith(
            os.path.abspath(c.path) + os.sep
        )
    # source untouched and fully readable
    assert src.load().count() > 0
    assert c.load().count() == src.load().count()


def test_diff_versions_append_only_fast_path(spark, src):
    """An append-only version range must produce the change feed by
    reading ONLY the appended files (zero exchanges in the plan) and
    match the general exceptAll result exactly."""
    from delta_lake_optimizations_spark.plans.inspect import plan_summary

    v0 = src.latest_version()
    batch = src.load().limit(5)
    src.write(batch, mode="append")
    src.write(src.load().limit(3), mode="append")

    feed = diff_versions(src, v0)
    s = plan_summary(feed)
    assert s["exchanges"] == 0, "append-only CDF must not shuffle"
    assert feed.filter(F.col("_change_type") == "delete").count() == 0
    assert feed.count() == 8

    # once the range contains a delete the general exceptAll path takes
    # over; its multiset identity must hold:
    # count(to) = count(from) + inserts - deletes
    some_key = src.load().select("s_suppkey").first()[0]
    delete(src, f"s_suppkey = {some_key}")
    general = diff_versions(src, v0)
    n_from = src.load(version=v0).count()
    n_to = src.load().count()
    n_ins = general.filter(F.col("_change_type") == "insert").count()
    n_del = general.filter(F.col("_change_type") == "delete").count()
    assert n_to == n_from + n_ins - n_del
    assert n_del >= 1


def test_convert_to_graft_in_place(spark, tmp_path):
    """CONVERT TO DELTA parity: bare parquet dirs (flat and hive-
    partitioned) register as v0 with footer stats — zero data I/O — and
    every engine feature works afterwards (skipping, OPTIMIZE, time
    travel)."""
    from delta_lake_optimizations_spark.table import convert_to_graft

    from .conftest import SF_DIR

    # flat directory
    src_df = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    flat = str(tmp_path / "flat")
    src_df.repartition(4).write.parquet(flat)
    t = convert_to_graft(spark, flat)
    assert t.snapshot().version == 0
    assert t.load().count() == src_df.count()
    assert len(t.snapshot().files) == 4
    # footer stats arrived -> min/max skipping works immediately
    some_key = src_df.agg(F.max("s_suppkey")).collect()[0][0]
    assert t.files_scanned(skip_where=[("s_suppkey", "=", some_key)]) <= 4
    # maintenance works on the converted table; conversion stays v0
    optimize(t, target_file_mb=512)
    assert t.load(version=0).count() == src_df.count()

    # partitioned directory: declared partition columns validated
    part = str(tmp_path / "part")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("o_year").parquet(part)
    tp = convert_to_graft(spark, part, partition_columns=["o_year"])
    assert tp.load().count() == orders.count()
    assert tp.snapshot().partition_columns == ["o_year"]
    years = sorted({f.partition_values["o_year"] for f in tp.snapshot().files})
    pruned = tp.files_scanned(skip_where=[("o_year", "=", int(years[0]))])
    assert pruned < len(tp.snapshot().files)

    # wrong declaration aborts (partitioned layout, no declaration)
    import pytest as _pytest

    part2 = str(tmp_path / "part2")
    orders.limit(100).write.partitionBy("o_year").parquet(part2)
    with _pytest.raises(ValueError, match="partition mismatch"):
        convert_to_graft(spark, part2)

    # converting twice is refused
    with _pytest.raises(ValueError, match="already a GraftTable"):
        convert_to_graft(spark, flat)
