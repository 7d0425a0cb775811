"""Window-function queries (SURVEY.md §2.8: rank/row_number/lag/lead/running aggs).

Every window ordering includes a unique key tiebreaker so results are
deterministic across engines (required for the driver's value-hash compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


@query(
    "window_topk_per_group",
    headline=True,
    tags=("window", "topk"),
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice, rn
        FROM (
            SELECT
                p_brand,
                p_partkey,
                p_retailprice,
                ROW_NUMBER() OVER (
                    PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey
                ) AS rn
            FROM part
        )
        WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand — the canonical top-k-per-group
    pattern (Window.partitionBy + row_number <= k)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


@query(
    "window_lag_lead",
    tags=("window",),
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            ROUND(o_totalprice, 2) AS price,
            ROUND(LAG(o_totalprice) OVER w, 2) AS prev_price,
            ROUND(LEAD(o_totalprice) OVER w, 2) AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
    )


@query(
    "window_running_sum",
    tags=("window",),
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            ROUND(SUM(o_totalprice) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ), 2) AS running_total
        FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of order value per customer (cumulative rows frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_rank_dense",
    tags=("window",),
    oracle="""
        SELECT
            s_nationkey,
            s_suppkey,
            RANK() OVER w AS bal_rank,
            DENSE_RANK() OVER w AS bal_dense_rank
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank of suppliers by account balance within nation.

    Rank values are tie-stable (equal inputs get equal ranks) so no
    tiebreaker is needed for hash-determinism.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return supplier.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@query(
    "window_ntile_quartiles",
    tags=("window",),
    oracle="""
        SELECT
            o_orderkey,
            NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile
        FROM orders
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE bucketing with exact SQL semantics — computed by the
    scalable two-pass ranking operator (distributed range sort + partition
    offsets) instead of ``Window.orderBy()`` with no partition key, which
    would move every row through a single task at scale."""
    from delta_lake_optimizations_spark.operators.ranking import ntile_exact

    orders = load_table(spark, sf_dir, "orders")
    return ntile_exact(
        orders, 4, ["o_totalprice", "o_orderkey"], bucket_col="price_quartile"
    ).select("o_orderkey", "price_quartile")


@query(
    "window_range_moving_sum",
    tags=("window", "range-frame"),
    oracle="""
        SELECT
            o_orderkey,
            o_custkey,
            o_orderdate,
            CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
                AS moving_sum_30d,
            COUNT(*) OVER w AS n_orders_30d
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
            RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
        )
    """,
)
def window_range_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day moving order value and order count per customer — a RANGE
    window frame (value-defined, not row-defined), the shape the
    rows-based windows above can't express.

    Both engines order by integer epoch-days so ``RANGE 29 PRECEDING``
    means the same calendar window; a value-defined frame is also
    deterministic under same-date ties (all peers are in the frame), so no
    tiebreaker column is needed. One shuffle on o_custkey; the frame scan
    is a single ordered pass per partition.

    The sum accumulates in DECIMAL(18,4) — associative, so partition order
    can't flip low bits — and the inputs carry two decimal places, so the
    final round-to-2 is never at a half boundary (a plain double moving
    AVG here disagrees between engines by one cent on exact .xx5
    quotients).
    """
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff("o_orderdate", F.lit("1970-01-01"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-29, W.currentRow)
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,4)")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum(price_dec).over(w), 2).cast("double").alias("moving_sum_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@query(
    "window_percent_rank_cume_dist",
    tags=("window", "distribution"),
    oracle="""
        SELECT
            o_orderkey,
            o_custkey,
            ROUND(PERCENT_RANK() OVER (
                PARTITION BY o_orderpriority ORDER BY o_totalprice
            ), 6) AS pct_rank,
            ROUND(CUME_DIST() OVER (
                PARTITION BY o_orderpriority ORDER BY o_totalprice
            ), 6) AS cume
        FROM orders
    """,
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position window functions (percentile position and
    cumulative distribution within each priority class). Partitioned by
    a real key, so the window scales — no partitionless funnel."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
