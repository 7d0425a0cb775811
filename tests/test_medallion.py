"""Medallion end-to-end: bronze (raw versioned appends) → silver (streamed
off bronze's commit log via the graft datasource, cleaned, appended
exactly-once) → gold (materialized aggregate refreshed per micro-batch).
The full chain is incremental: appending to bronze and re-running the
availableNow stream moves ONLY the new commit through silver and gold.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.sources.graft_datasource import (
    register_graft_source,
)
from delta_lake_optimizations_spark.streaming.graft_sink import (
    write_stream_to_graft_with_matview,
)
from delta_lake_optimizations_spark.table import (
    GraftTable,
    create_matview,
    matview_is_fresh,
)


@pytest.fixture()
def graft(spark):
    register_graft_source(spark)
    return spark


def _raw(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("kind"),
        (F.col("id") * 2).alias("value"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.lit("ok")).alias("status"),
    )


def _run_silver(spark, bronze_path, silver, gold, ckpt):
    stream = spark.readStream.format("graft").option("path", bronze_path).load()
    clean = stream.filter(F.col("status").isNotNull()).drop("status")
    q = write_stream_to_graft_with_matview(clean, silver, gold, ckpt)
    q.awaitTermination(180)


def test_medallion_bronze_silver_gold(graft, tmp_path):
    spark = graft
    bronze = GraftTable(spark, os.path.join(tmp_path, "bronze"))
    bronze.write(_raw(spark, 0, 100))
    bronze.write(_raw(spark, 100, 150), mode="append")

    silver = GraftTable(spark, os.path.join(tmp_path, "silver"))
    silver.write(_raw(spark, 0, 0).drop("status"))  # typed empty seed
    gold = create_matview(
        spark,
        silver,
        os.path.join(tmp_path, "gold"),
        ["kind"],
        {"n": ["count"], "total_value": ["sum", "value"]},
    )
    ckpt = os.path.join(tmp_path, "ckpt")

    _run_silver(spark, bronze.path, silver, gold, ckpt)
    # silver holds exactly the clean rows (150 minus the 15 null-status)
    assert silver.load().count() == 135
    assert matview_is_fresh(gold, silver)
    expect = {
        r["kind"]: (r["n"], r["total_value"])
        for r in silver.load()
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .collect()
    }
    got = {r["kind"]: (r["n"], r["total_value"]) for r in gold.load().collect()}
    assert got == expect

    # incremental leg: new bronze commit, resumed stream — only the new
    # rows land (no re-emission), gold follows
    silver_version_before = silver.latest_version()
    bronze.write(_raw(spark, 150, 200), mode="append")
    _run_silver(spark, bronze.path, silver, gold, ckpt)
    assert silver.load().count() == 180
    assert silver.load().select("event_id").distinct().count() == 180, "no replays"
    assert matview_is_fresh(gold, silver)
    assert gold.load().agg(F.sum("n")).first()[0] == 180
    # the resumed leg appended new commits instead of rewriting
    assert silver.latest_version() > silver_version_before
