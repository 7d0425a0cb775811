"""Two-pass Misra-Gries frequent items: the candidate pass must never
drop a true heavy hitter (the MG guarantee), and the final output must
equal the full GROUP BY exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.heavyhitters import frequent_items


def test_frequent_items_equals_full_groupby_on_skewed_stream(spark):
    """Adversarial skew: one token at 5%, a handful at ~1%, a long tail of
    uniques spread across many partitions. The MG two-pass result must be
    byte-equal to the exact full-shuffle answer."""
    n = 40_000
    tok = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 20 == 0, F.lit("hot"))        # 5%
            .when(F.col("id") % 100 < 3, F.concat(F.lit("warm_"), (F.col("id") % 3).cast("string")))
            .otherwise(F.concat(F.lit("tail_"), F.col("id").cast("string")))
            .alias("tok")
        )
        .repartition(16)  # tails scattered over many partitions
    )
    got = {
        (r["token"], r["n"])
        for r in frequent_items(tok, F.col("tok"), fraction=0.005).collect()
    }
    want = {
        (r["tok"], r["n"])
        for r in tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 0.005 * n)
        .collect()
    }
    assert got == want and ("hot", n // 20) in got


def test_candidate_pass_is_shuffle_free(spark):
    from delta_lake_optimizations_spark.operators.heavyhitters import (
        _misra_gries_candidates,
    )
    from delta_lake_optimizations_spark.plans.inspect import plan_summary

    tok = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("tok")
    )
    cand = _misra_gries_candidates(tok, "tok", k=32)
    assert plan_summary(cand)["exchanges"] == 0
