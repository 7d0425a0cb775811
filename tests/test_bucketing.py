"""Bucketed-join tests: the join over two tables bucketed on the key must
plan WITHOUT exchanges (shuffle-free co-located join) and produce the same
result as the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.bucketing import (
    joined_bucketed,
    write_bucketed,
)
from delta_lake_optimizations_spark.plans.inspect import plan_summary

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # disable broadcast so the test exercises the bucketed shuffle path
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_by=["o_orderkey"],
                   path=str(wh / "orders_b"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", ["o_orderkey"], 8, sort_by=["o_orderkey"],
        path=str(wh / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = joined_bucketed(spark, lt, rt, ["o_orderkey"])
        s = plan_summary(joined)
        assert s["exchanges"] == 0, "bucketed join must not shuffle either side"
        assert s["sort_merge_joins"] + s["shuffled_hash_joins"] >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = joined_bucketed(spark, lt, rt, ["o_orderkey"]).count()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).count()
    assert got == want
