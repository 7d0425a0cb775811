"""Set operations, distinct, and multi-dimensional grouping (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table, register_tables
from delta_lake_optimizations_spark.registry import query


@query(
    "set_union_all",
    tags=("setop",),
    oracle="""
        SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT event_id, event_type FROM events WHERE value > 90
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) of two filtered branches."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("event_id", "event_type")
    b = events.filter(F.col("value") > 90).select("event_id", "event_type")
    return a.union(b)


@query(
    "set_intersect",
    tags=("setop",),
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers having both open and finished orders."""
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(done_c)


@query(
    "set_except_all",
    tags=("setop",),
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference) preserving multiplicity."""
    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select("o_custkey")
    f_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_c.exceptAll(f_c)


@query(
    "distinct_flag_status",
    tags=("setop",),
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (hash aggregate, no shuffle of
    the full row payload)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "rollup_order_counts",
    tags=("grouping",),
    oracle="""
        SELECT
            o_orderstatus,
            o_orderpriority,
            COUNT(*) AS cnt,
            ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per (status, priority), per status, and grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "cube_lineitem_qty",
    tags=("grouping",),
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem status dimensions."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "grouping_sets_mixed",
    tags=("grouping",),
    oracle="""
        SELECT
            o_orderstatus,
            o_orderpriority,
            COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (reference entry style 1, SURVEY §3)."""
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )
