"""Salted-join correctness: identical results to the plain join on a
deliberately skewed key distribution, with the salt spreading the hot key
across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of big rows share one hot key
    big = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    return big, small


def test_salted_inner_join_matches_plain(spark):
    big, small = _skewed_frames(spark)
    got = salted_join(big, small, "k", salt=8)
    want = big.join(small, "k")
    assert got.count() == want.count()
    g = got.agg(F.sum(F.col("payload") + F.col("dim_val")).alias("s")).collect()[0]["s"]
    w = want.agg(F.sum(F.col("payload") + F.col("dim_val")).alias("s")).collect()[0]["s"]
    assert g == w


def test_salted_left_join_matches_plain(spark):
    big, small = _skewed_frames(spark)
    small_partial = small.filter(F.col("k") < 50)  # force unmatched rows
    got = salted_join(big, small_partial, "k", salt=4, how="left")
    want = big.join(small_partial, "k", "left")
    assert got.count() == want.count()
    assert (
        got.filter(F.col("dim_val").isNull()).count()
        == want.filter(F.col("dim_val").isNull()).count()
    )


def test_salt_spreads_hot_key(spark):
    big, small = _skewed_frames(spark)
    salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int"),
    )
    buckets = (
        salted.filter(F.col("k") == 1)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(buckets) == 8  # the hot key now occupies every salt bucket
    counts = [r["count"] for r in buckets]
    assert max(counts) < sum(counts)  # no single bucket holds everything


def test_aqe_skew_split_engages_on_engineered_hot_key(spark):
    """Plan guard (VERDICT r10 #4): with 30% of a 2M-row fact on one key
    and AQE's split thresholds scaled to demo size, the FINAL adaptive
    plan must carry the skew-handled sort-merge join — and turning
    skewJoin off must make the marker disappear (proving the guard
    observes the feature, not a coincidental string)."""
    from delta_lake_optimizations_spark.operators.skew import (
        engineered_skew_frames,
        executed_plan_string,
        skew_demo_confs,
    )

    big, small = engineered_skew_frames(spark, n_big=1_000_000)
    # 64KB dials: the single-column shuffle compresses hard (30% constant
    # key), so the hot partition lands under AQE's 256KB demo default at
    # this row count
    with skew_demo_confs(spark, threshold="64KB", advisory="64KB"):
        j = big.join(small, "k").groupBy().agg(F.sum("w").alias("s"))
        j.collect()
        plan = executed_plan_string(j)
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            j2 = big.join(small, "k").groupBy().agg(F.sum("w").alias("s"))
            j2.collect()
            plan2 = executed_plan_string(j2)
            assert "skew=true" not in plan2
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
