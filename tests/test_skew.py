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
