"""Scalar expression surface: string / date / math / conditional / JSON
(SURVEY.md §2.2 and §2.8).

These exercise the reference's projection operators (P1-P8,
docs/02-lab-optimizations.md:54-64) plus the JSON access the driver corpus
requires for ``events.props``. Every expression stays JVM-side (built-in
functions, whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


@query(
    "scalar_string_funcs",
    tags=("scalar",),
    oracle="""
        SELECT
            doc_id,
            UPPER(SUBSTR(text, 1, 12)) AS head_upper,
            LENGTH(text) AS text_len,
            CONCAT(lang, ':', source) AS lang_source,
            CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END AS mentions_data,
            REPLACE(SUBSTR(text, 1, 20), ' ', '_') AS head_snake,
            TRIM(LOWER(SUBSTR(text, 1, 8))) AS head_lower
        FROM documents
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: substring/upper/lower/length/concat/replace/trim/like."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.length("text").alias("text_len"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.when(F.col("text").like("%data%"), 1).otherwise(0).alias("mentions_data"),
        F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.trim(F.lower(F.substring("text", 1, 8))).alias("head_lower"),
    )


@query(
    "scalar_date_funcs",
    tags=("scalar",),
    oracle="""
        SELECT
            o_orderkey,
            YEAR(o_orderdate) AS order_year,
            MONTH(o_orderdate) AS order_month,
            DAY(o_orderdate) AS order_day,
            CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
            DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch0,
            strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date
        FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: year/month/day extraction, truncation, diffs,
    date arithmetic (reference P6, docs/02-lab-optimizations.md:56)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch0"),
        # emitted as a string: DATE-typed outputs render as datetime.date on
        # the Spark side but pandas Timestamp on the DuckDB side of the
        # driver's canonicalizer, hash-mismatching on identical values
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


@query(
    "scalar_math_funcs",
    tags=("scalar",),
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            CAST(ROUND(
                CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(3,2)))
                * (1 + CAST(l_tax AS DECIMAL(3,2))), 2) AS DOUBLE) AS charge,
            ABS(l_quantity - 25.0) AS qty_dev,
            CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_bucket,
            CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_decade,
            ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
            ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
            CAST(l_orderkey % 7 AS BIGINT) AS key_mod
        FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + math functions (reference P8, docs/02-lab-optimizations.md:63)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        # exact DECIMAL arithmetic on both sides — float ROUND(x,2) is
        # half-boundary-unstable between engines
        F.round(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(3,2)"))
            * (F.lit(1) + F.col("l_tax").cast("decimal(3,2)")),
            2,
        )
        .cast("double")
        .alias("charge"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_bucket"),
        F.floor(F.col("l_quantity") / 10.0).alias("qty_decade"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
    )


@query(
    "scalar_conditional",
    tags=("scalar",),
    oracle="""
        SELECT
            o_orderkey,
            CASE
                WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low'
            END AS price_tier,
            COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
            CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_rush
        FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiers, COALESCE/NULLIF, IN-list membership."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_rush"),
    )


@query(
    "json_extract_props",
    tags=("scalar", "json"),
    oracle="""
        SELECT
            event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string access on events.props (SURVEY §1.3: the driver corpus
    extension beyond the reference's flat types)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )
