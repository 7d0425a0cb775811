"""Core relational queries: filters, aggregations, joins (SURVEY.md §2.2-2.3, §2.8).

The flagship query (``q5_revenue_by_nation``) mirrors the reference's
signature pattern — a selective conjunctive filter feeding an aggregation
(reference ``docs/02-lab-optimizations.md:98-102``) — expressed over the
TPC-H-ish driver corpus as a multi-join revenue rollup.

Scale notes (100 TB mindset):
- Dimension tables (region, nation, supplier, customer at small SF) are
  broadcast explicitly where they are guaranteed small; fact-fact joins
  (lineitem x orders) are left to sort-merge + AQE.
- All aggregates are expressed with built-in functions so they get
  map-side partial aggregation and whole-stage codegen.
- Floating-point aggregates are rounded identically on both sides (driver
  value-hash is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


@query(
    "q1_pricing_summary",
    headline=True,
    tags=("agg", "tpch"),
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
            CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))), 2) AS DOUBLE) AS sum_disc_price,
            CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))), 2) AS DOUBLE) AS sum_charge,
            ROUND(AVG(l_quantity), 4) AS avg_qty,
            ROUND(AVG(l_extendedprice), 4) AS avg_price,
            ROUND(AVG(l_discount), 4) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate with 8 aggregates.

    Catalyst pushes the shipdate predicate to the parquet scan; the
    aggregation runs partial (map-side) then final after a shuffle on the
    two low-cardinality group keys.

    The money sums accumulate in DECIMAL and are rounded IN DECIMAL, cast
    to double last: prices/discount/tax carry 2 decimal digits, so the
    2- and 3-factor products are exact <=6-dp decimals — the 8-dp cast
    recovers them exactly in both engines (binary noise ~1e-11 washes
    out), the decimal sum is order-independent, and the 2-dp HALF_UP
    round can't diverge on representation ties the way rounding the
    double image does (measured one-cent diffs at the 30M-row sf5
    rehearsal). AVGs stay double: a quotient is never a short decimal,
    so its shortest repr rounds identically in both engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price.cast("decimal(18,8)")), 2)
            .cast("double").alias("sum_disc_price"),
            F.round(F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(18,8)")), 2)
            .cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_unshipped_orders",
    headline=True,
    tags=("join", "topk", "tpch"),
    oracle="""
        SELECT
            l_orderkey,
            CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
            o_orderdate,
            o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k.

    ``customer`` is broadcast (small dim side); lineitem x orders is the
    big join. Ordering ties broken on l_orderkey so the LIMIT is stable.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    headline=True,
    tags=("join", "agg", "flagship", "tpch"),
    oracle="""
        SELECT
            n_name,
            CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q5 — 6-way join, selective region+date filter, revenue rollup.

    Join order: facts joined first on their natural keys, all dimension
    sides broadcast. The region filter reaches nation via broadcast so the
    fact shuffle only carries surviving rows.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    asian_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asian_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "selective_filter_count",
    tags=("filter",),
    oracle="""
        SELECT COUNT(*) AS n
        FROM orders
        WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
)
def selective_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference P9/A2 analog: conjunctive equality filter + count.

    Mirrors the lab's flagship selective predicate
    (``country='US' AND category='electronics'``,
    reference docs/02-lab-optimizations.md:98-102) on the driver corpus.
    Both predicates push down to the parquet scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "group_count",
    tags=("agg",),
    oracle="SELECT l_returnflag, COUNT(*) AS count FROM lineitem GROUP BY l_returnflag",
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A3: groupBy(key).count() hash aggregation."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").count()


@query(
    "group_multi_agg",
    tags=("agg",),
    oracle="""
        SELECT
            o_orderpriority,
            COUNT(*) AS cnt,
            ROUND(AVG(o_totalprice), 4) AS avg_price,
            ROUND(SUM(o_totalprice), 2) AS sum_price,
            ROUND(MIN(o_totalprice), 2) AS min_price,
            ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def group_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A4: multi-aggregate per key (COUNT + AVG + SUM + MIN/MAX)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "join_inner_segment_sales",
    tags=("join",),
    oracle="""
        SELECT
            c_mktsegment,
            COUNT(*) AS n_orders,
            ROUND(SUM(o_totalprice), 2) AS total_sales
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def join_inner_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, dim side broadcast, rollup by segment."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
        )
    )


@query(
    "join_left_outer_order_counts",
    tags=("join",),
    oracle="""
        SELECT
            c_custkey,
            COUNT(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_customers_with_open_orders",
    tags=("join",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        )
    """,
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). Spark plans a broadcast/shuffled semi join."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    tags=("join",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_dims_supplier_rollup",
    tags=("join",),
    oracle="""
        SELECT
            r_name,
            COUNT(*) AS n_suppliers,
            ROUND(AVG(s_acctbal), 4) AS avg_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def join_dims_supplier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join of small dims, all broadcast — zero shuffles on the probe side."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@query(
    "column_stats_summary",
    tags=("stats",),
    oracle="""
        SELECT
            COUNT(*) AS n_rows,
            ROUND(MIN(l_quantity), 2) AS min_qty,
            ROUND(MAX(l_quantity), 2) AS max_qty,
            COUNT(DISTINCT l_partkey) AS n_parts,
            CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_flags,
            ROUND(AVG(LENGTH(l_returnflag)), 4) AS avg_flag_len,
            MAX(LENGTH(l_linestatus)) AS max_status_len
        FROM lineitem
    """,
)
def column_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A5/T1: the per-column statistics aggregation the Fabric
    automated-stats feature collects at write time
    (docs/02-lab-optimizations.md:591: row counts, min/max, null counts,
    distinct counts, column lengths)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0)).alias("null_flags"),
        F.round(F.avg(F.length("l_returnflag")), 4).alias("avg_flag_len"),
        F.max(F.length("l_linestatus")).alias("max_status_len"),
    )


@query(
    "group_percentiles",
    tags=("agg", "percentile"),
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS med_price,
               quantile_cont(l_extendedprice, 0.9) AS p90_price,
               quantile_cont(l_extendedprice, 0.25) AS p25_price
        FROM lineitem GROUP BY l_returnflag
    """,
)
def group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median/p25/p90).

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    linear-interpolation definition, so results are bitwise identical —
    no rounding needed. At scale, swap to ``approx_percentile`` (t-digest
    sketch, map-side combinable) when exactness isn't required."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("med_price"),
        F.percentile("l_extendedprice", 0.9).alias("p90_price"),
        F.percentile("l_extendedprice", 0.25).alias("p25_price"),
    )


@query("approx_percentiles_sketch", tags=("agg", "percentile", "sketch"))
def approx_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group percentiles via Spark's mergeable quantile
    sketch (``approx_percentile``, Greenwald-Khanna with accuracy 10000 →
    max rank error 1e-4). Rows-only driver check; pytest pins the error
    against the exact interpolated percentiles of ``group_percentiles``.

    This is the 100 TB path the exact query's docstring points at: exact
    ``percentile`` must shuffle every value to its group to sort, while
    the sketch is map-side combinable — each partition ships a bounded
    summary, so the shuffle is O(groups x sketch), not O(rows)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    p = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)), 10000
    )
    return lineitem.groupBy("l_returnflag").agg(
        p.getItem(0).alias("p25_price"),
        p.getItem(1).alias("med_price"),
        p.getItem(2).alias("p90_price"),
    )


@query("hll_distinct_parts_by_flag", tags=("agg", "sketch"))
def hll_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate distinct counts via Datasketches HLL
    (rows-only driver check; pytest pins accuracy vs exact and
    sketch-merge associativity).

    At 100 TB, COUNT(DISTINCT x) per group forces a full shuffle of x;
    hll_sketch_agg is map-side combinable and its sketches union across
    groups/partitions/days — the pattern for distinct-count rollups."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("l_partkey")
            ).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "array_agg_status_profile",
    tags=("agg", "array"),
    oracle="""
        SELECT o_custkey,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
    """,
)
def array_agg_status_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-customer distinct order statuses collected
    into a sorted array (sorting makes the set deterministic across
    partition merge order on both engines) plus an order count — one hash
    aggregate, map-side partial on both measures.

    The sorted array is serialized with ``array_join`` because the
    driver's canonicalizer (pandas ``sort_values``) cannot sort
    list-typed columns; the string form carries identical information."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "stats_corr_covar",
    tags=("agg", "statistics"),
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
               ROUND(stddev_samp(l_extendedprice), 2) AS stddev_price,
               ROUND(var_samp(l_discount), 6) AS var_discount,
               ROUND(AVG(l_quantity), 4) AS avg_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def stats_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: Pearson correlation, sample
    covariance/stddev/variance (the OLAP stats surface the reference's CBO
    discussion presumes, ``docs/02-lab-optimizations.md:591-599``).

    All five are single-pass, map-side-combinable moments aggregates in
    Spark (partial ``HashAggregate`` with sum/sum-of-squares/co-moments), so
    at 100 TB this is one shuffle of 5 doubles per group — no second pass.
    Rounded on both sides: the moment recurrences are mathematically
    identical but accumulate in different partition orders.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_discount"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


@query(
    "histogram_price_fixed_width",
    tags=("agg", "histogram", "profiling"),
    oracle="""
        SELECT
            CAST(LEAST(FLOOR(l_extendedprice / 5000), 23) AS BIGINT) * 5000
                AS bucket_start,
            COUNT(*) AS n_rows,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                AS bucket_value
        FROM lineitem
        GROUP BY 1
    """,
)
def histogram_price_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of line-item price (24 x 5000-wide buckets,
    top bucket open-ended) — the data-profiling shape behind the
    reference's column-statistics discussion
    (``docs/02-lab-optimizations.md:591-599``).

    Fixed literal bounds keep it a single map-side-combinable hash
    aggregate — a data-dependent min/max would cost a second full pass at
    100 TB. Bucket math is FLOOR of an IEEE double division, identical in
    both engines; the per-bucket sum accumulates in DECIMAL(18,4) so
    partition order can't flip the rounded output.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.least(F.floor(F.col("l_extendedprice") / 5000), F.lit(23)).cast("long")
        * 5000
    ).alias("bucket_start")
    return (
        lineitem.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2
            ).cast("double").alias("bucket_value"),
        )
    )
