"""Statistics/CBO tests (reference T1-T3, docs/02-lab-optimizations.md:
587-785): one-pass column stats, the StatisticsStore lifecycle, catalog
ANALYZE injection feeding real CBO row counts, and plan-stats inspection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.stats import (
    StatisticsStore,
    column_stats,
    inject_cbo_stats,
    plan_stats,
)
from delta_lake_optimizations_spark.table import GraftTable, optimize

from .conftest import SF_DIR


@pytest.fixture()
def orders_table(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(4)
    t = GraftTable(spark, str(tmp_path / "orders"))
    t.write(df)
    return t


def test_column_stats_one_pass(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    s = column_stats(df)
    assert s["rowCount"] == df.count()
    c = s["columns"]["o_totalprice"]
    assert c["nullCount"] == 0
    assert c["min"] > 0 and c["max"] > c["min"]
    # approx_count_distinct within 10% of exact
    exact = df.select("o_custkey").distinct().count()
    approx = s["columns"]["o_custkey"]["distinctCount"]
    assert abs(approx - exact) / exact < 0.1
    # string columns get length stats (reference :591 "column lengths")
    assert s["columns"]["o_orderpriority"]["maxLen"] >= s["columns"]["o_orderpriority"]["avgLen"]


def test_stats_store_lifecycle(orders_table):
    store = StatisticsStore(orders_table)
    assert store.get() is None
    s = store.collect()
    assert store.get()["rowCount"] == s["rowCount"]
    # recompute with compaction (reference recomputeStatisticsWithCompaction :685)
    before_files = len(orders_table.snapshot().files)
    s2 = store.recompute(compact=True, target_file_mb=512)
    assert s2["rowCount"] == s["rowCount"]
    assert len(orders_table.snapshot().files) < before_files
    assert s2["version"] > s["version"]
    # removal (reference removeStatisticsData :684)
    assert store.remove() == 2
    assert store.get() is None


def test_inject_cbo_stats_feeds_rowcount(spark, orders_table):
    optimize(orders_table, target_file_mb=512)
    inject_cbo_stats(spark, "orders_cbo", orders_table)
    try:
        ps = plan_stats(spark.table("orders_cbo"))
        assert ps["rowCount"] == orders_table.load().count()
        # filtered plan still carries a CBO estimate
        ps_f = plan_stats(spark.table("orders_cbo").filter(F.col("o_totalprice") > 1000))
        assert ps_f["sizeInBytes"] > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_cbo")


def test_inject_requires_single_dir(spark, orders_table):
    orders_table.write(orders_table.load().limit(5), mode="append")
    with pytest.raises(ValueError, match="optimize"):
        inject_cbo_stats(spark, "orders_cbo2", orders_table)


def test_auto_stats_at_write(spark, tmp_path):
    """T1 narrative: with delta.stats.extended.collect=true, every write
    persists column stats automatically — no explicit collect() call."""
    from delta_lake_optimizations_spark.table import GraftTable

    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    t = GraftTable(spark, str(tmp_path / "n"))
    t.write(df, properties={"delta.stats.extended.collect": "true"})
    store = StatisticsStore(t)
    s = store.get()
    assert s is not None and s["version"] == 0
    assert s["rowCount"] == df.count()
    # appends keep collecting (property persists in metadata)
    t.write(df.limit(3), mode="append")
    assert store.get()["version"] == 1
    assert store.get()["rowCount"] == df.count() + 3


def test_session_conf_enables_stats_collect(spark, tmp_path):
    """Reference parity (docs/02-lab-optimizations.md:605-610): the lab's
    conf-first flow — set the SESSION conf, never touch TBLPROPERTIES —
    must collect extended stats at write."""
    from delta_lake_optimizations_spark.table import GraftTable

    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    spark.conf.set("spark.microsoft.delta.stats.collect.extended", "true")
    try:
        t = GraftTable(spark, str(tmp_path / "conf_on"))
        t.write(df)
        assert StatisticsStore(t).get() is not None, "session conf ignored"
    finally:
        spark.conf.set("spark.microsoft.delta.stats.collect.extended", "false")
    # conf off again: a fresh table collects nothing
    t2 = GraftTable(spark, str(tmp_path / "conf_off"))
    t2.write(df)
    assert StatisticsStore(t2).get() is None


def test_table_property_overrides_session_conf(spark, tmp_path):
    """Reference parity (:617, 'It overrides session configs'): an explicit
    table property wins in BOTH directions."""
    from delta_lake_optimizations_spark.table import GraftTable

    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    spark.conf.set("spark.microsoft.delta.stats.collect.extended", "true")
    try:
        t = GraftTable(spark, str(tmp_path / "prop_false"))
        t.write(df, properties={"delta.stats.extended.collect": "false"})
        assert StatisticsStore(t).get() is None, "property=false must win"
    finally:
        spark.conf.set("spark.microsoft.delta.stats.collect.extended", "false")
    t2 = GraftTable(spark, str(tmp_path / "prop_true"))
    t2.write(df, properties={"delta.stats.extended.collect": "true"})
    assert StatisticsStore(t2).get() is not None, "property=true must win"
