"""Interval-join tests: equivalence with the naive inequality join, plan
quality (no nested loop), and before-window support."""

from __future__ import annotations

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.rangejoin import interval_join
from delta_lake_optimizations_spark.temporal import epoch_seconds
from pyspark.sql import functions as F

from .conftest import SF_DIR


def _sides(spark):
    events = load_table(spark, SF_DIR, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    return clicks, views


def test_interval_join_matches_inequality_join(spark):
    clicks, views = _sides(spark)
    got = interval_join(
        clicks, views, "user_id", "ts", "vts",
        before_seconds=600, after_seconds=1800,
    ).select("cid", "vid")
    want = clicks.join(
        views,
        (clicks["user_id"] == views["user_id"])
        & (epoch_seconds(views["vts"]) >= epoch_seconds(clicks["ts"]) - 600)
        & (epoch_seconds(views["vts"]) <= epoch_seconds(clicks["ts"]) + 1800),
    ).select("cid", "vid")
    g = {(r["cid"], r["vid"]) for r in got.collect()}
    w = {(r["cid"], r["vid"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_interval_join_no_nested_loop(spark):
    clicks, views = _sides(spark)
    joined = interval_join(clicks, views, "user_id", "ts", "vts")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
