"""Skew-aware join: salting for hot keys (SURVEY §4 / the 100 TB checklist).

AQE's skew-join handling (on by default in our session factory) splits
oversized SORT-MERGE partitions at runtime, which covers most cases. This
module is for the case AQE can't fix: a broadcast-ineligible join where a
handful of keys dominate (e.g. a null-heavy or power-law foreign key).

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets, so one hot key becomes R parallel
tasks instead of one straggler. Identical results to a plain inner join
(verified by test), cost = R× duplication of the small side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-based skew
    mitigation. ``how`` supports inner/left (the skewed-side-preserving
    shapes). The join key keeps its name; other columns pass through."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")

    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(exploded, [on, "__salt"], how)
    return out.drop("__salt")


@query(
    "skew_salted_join_brand_revenue",
    tags=("join", "skew", "scale"),
    oracle="""
        SELECT
            p.p_brand,
            CAST(COUNT(*) AS BIGINT) AS n_items,
            CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
)
def skew_salted_join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue THROUGH the salted join: results must be identical to
    a plain equi-join (the oracle runs one), proving salting is a pure
    physical rewrite. DECIMAL accumulation makes the sum order-independent
    so the hash can't be flipped by the salt's different reduction order.

    The salt matters when a handful of foreign-key values dominate a
    broadcast-ineligible join — each hot key becomes ``salt`` parallel
    tasks instead of one straggler. AQE's skew handling covers sort-merge
    splits; this covers the planner-blind cases (e.g. null-heavy keys).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, on="l_partkey", salt=8)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2
        ).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# AQE skew-split evidence (VERDICT r10 #4): SURVEY §4 delegates hot-key
# handling to AQE's runtime skew-join split, but nothing PINNED that the
# split actually engages. The helpers below engineer a hot key and scale
# AQE's split thresholds down to demo size (production keeps the 256 MB
# default — at 100 TB the real partitions cross it on their own), so a
# plan guard can assert `SortMergeJoin(skew=true)` / `AQEShuffleRead ...
# skewed` in the FINAL adaptive plan and the bench can time the split
# against the no-skew-handling straggler and the salted fallback.
# ---------------------------------------------------------------------------

from contextlib import contextmanager


@contextmanager
def skew_demo_confs(
    spark: SparkSession,
    threshold: str = "256KB",
    advisory: str = "128KB",
    factor: int = 2,
):
    """Temporarily scale AQE's skew-split dials to demo data sizes and
    force the sort-merge path (broadcast off — a broadcastable dim never
    skews). Restores every conf on exit."""
    tune = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": str(factor),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": threshold,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
        # measured: at 8 shuffle partitions (the pytest session default)
        # the split never engages at ANY threshold — production runs
        # hundreds of partitions, so pin a realistic count for the demo
        "spark.sql.shuffle.partitions": "32",
    }
    saved: dict[str, str | None] = {}
    for k, v in tune.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def engineered_skew_frames(
    spark: SparkSession,
    n_big: int = 2_000_000,
    n_keys: int = 50_000,
    hot_frac: float = 0.3,
    hot_key: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """(big, small) join inputs where ``hot_frac`` of the big side lands
    on ONE key — the shape that turns a shuffle join into a straggler."""
    big = spark.range(n_big).select(
        F.when(F.rand(1) < hot_frac, F.lit(hot_key))
        .otherwise((F.rand(2) * n_keys).cast("long"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return big, small


def executed_plan_string(df: DataFrame) -> str:
    """Final (post-AQE) physical plan text. Only meaningful AFTER an
    action has run on ``df`` — AQE re-plans at runtime, so the pre-action
    plan never shows the skew split."""
    return df._jdf.queryExecution().executedPlan().toString()
