"""Scalable global-ranking operator tests: exact equivalence with the
single-partition window implementations it replaces."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.ranking import global_rank, ntile_exact

from .conftest import SF_DIR


def test_global_rank_matches_row_number(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    got = global_rank(df, ["o_totalprice", "o_orderkey"], rank_col="r", num_partitions=8)
    want = df.withColumn(
        "r", F.row_number().over(W.orderBy("o_totalprice", "o_orderkey"))
    )
    g = {(r["o_orderkey"], r["r"]) for r in got.select("o_orderkey", "r").collect()}
    w = {(r["o_orderkey"], r["r"]) for r in want.select("o_orderkey", "r").collect()}
    assert g == w


def test_ntile_exact_matches_window_ntile(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    got = ntile_exact(df, 7, ["o_totalprice", "o_orderkey"], bucket_col="b", num_partitions=8)
    want = df.withColumn(
        "b", F.ntile(7).over(W.orderBy("o_totalprice", "o_orderkey"))
    )
    g = {(r["o_orderkey"], r["b"]) for r in got.select("o_orderkey", "b").collect()}
    w = {(r["o_orderkey"], r["b"]) for r in want.select("o_orderkey", "b").collect()}
    assert g == w


def test_global_rank_no_single_partition_exchange(spark):
    """The produced plan must not contain a single-partition global sort or
    window (the thing this operator exists to avoid)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = global_rank(df, ["o_totalprice", "o_orderkey"], num_partitions=8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_hll_sketch_accuracy_and_merge(spark):
    """HLL estimates within 5% of exact; per-group sketches union to the
    global estimate (merge associativity — the property that makes the
    sketch usable for rollups without rescanning)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    est = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e")
    ).collect()[0]["e"]
    assert abs(est - exact) / exact < 0.05

    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    assert merged == est


def test_approx_percentile_close_to_exact(spark):
    from delta_lake_optimizations_spark.queries.relational import (
        approx_percentiles_sketch,
        group_percentiles,
    )

    exact = {
        r["l_returnflag"]: r.asDict() for r in group_percentiles(spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: r.asDict()
        for r in approx_percentiles_sketch(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p25_price", "med_price", "p90_price"):
            # rank error 1e-4 at accuracy=10000; at sf0.001 group sizes the
            # sketch is effectively exact up to the nearest actual value —
            # 1% relative tolerance is generous headroom.
            assert abs(a[col] - e[col]) <= 0.01 * abs(e[col]), (flag, col, a[col], e[col])
