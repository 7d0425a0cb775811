"""Reshaping surface (SURVEY §2.8 widening): unpivot/melt, positional
explode (LATERAL VIEW), map-typed access, and pivot.

All four are built-in narrow-or-one-shuffle plans:

- unpivot is a generate (row expansion) fused into the scan — at 100 TB
  unpivot-then-aggregate beats N separate column aggregates because the
  data is read once;
- posexplode is the LATERAL VIEW shape: row expansion with ordinal,
  no shuffle until the downstream aggregate;
- map access stays inside codegen (``from_json`` to a typed MapType —
  schema declared, never inferred, per the reference's S8 lesson);
- pivot with an explicit value list compiles to one hash aggregate of
  conditional sums (never a distinct-scan to discover pivot values —
  at scale always pass the value list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


@query(
    "unpivot_price_components",
    tags=("reshape",),
    oracle="""
        SELECT 'l_extendedprice' AS measure,
               ROUND(SUM(l_extendedprice), 2) AS total, COUNT(*) AS n
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', ROUND(SUM(l_discount), 2), COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'l_tax', ROUND(SUM(l_tax), 2), COUNT(*) FROM lineitem
    """,
)
def unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt of the three price measures, then one aggregate
    per measure — the read-once alternative to N per-column scans."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.unpivot(
            ids=["l_orderkey"],
            values=["l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .groupBy("measure")
        .agg(
            F.round(F.sum("value"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "explode_doc_tokens",
    tags=("reshape", "text"),
    oracle="""
        SELECT doc_id,
               CAST(unnest(range(len(string_split_regex(lower(trim(text)), '\\s+'))))
                    AS BIGINT) AS pos,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents
        WHERE doc_id < 40
    """,
)
def explode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode: one output row per token with its
    ordinal. Row expansion happens inside the scan stage — the shuffle
    (if any) belongs to whatever aggregates downstream."""
    documents = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    return (
        documents.filter(F.col("doc_id") < 40)
        .select("doc_id", F.posexplode(toks).alias("pos", "tok"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    )


@query(
    "map_event_props",
    tags=("reshape", "json"),
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                    THEN 'k' ELSE NULL END AS first_key
        FROM events
        WHERE event_id < 500
    """,
)
def map_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props parsed once into a typed ``map<string,string>``
    (explicit schema — no inference scan), then key access + key listing
    stay as codegen map expressions."""
    events = load_table(spark, sf_dir, "events")
    props_map = F.from_json(F.col("props"), T.MapType(T.StringType(), T.StringType()))
    return (
        events.filter(F.col("event_id") < 500)
        .withColumn("_m", props_map)
        .select(
            "event_id",
            F.element_at(F.col("_m"), "k").cast("long").alias("k_value"),
            F.array_join(F.array_sort(F.map_keys(F.col("_m"))), ",").alias("first_key"),
        )
    )


@query(
    "variant_props_rollup",
    tags=("reshape", "json", "variant"),
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS k_avg,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        FROM events
        GROUP BY event_type
    """,
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): ``parse_json``
    decodes each JSON document ONCE into the binary variant encoding, and
    every ``variant_get`` path extraction is a typed codegen expression on
    that encoding — no per-access string re-parse, no inference scan, and
    no fixed schema requirement (keys may vary row to row).

    The 100 TB contract: store the variant column in the table instead of
    the raw JSON string and the parse cost is paid once at ingest; path
    extractions then read only the requested fields (shredded-at-scan
    semantics), which is the scan-bound behavior map/struct columns get
    from parquet, extended to schemaless payloads. ``try_variant_get``
    (exercised in tests) is the malformed-tolerant variant for dirty
    corpora.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        events.withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("k_sum"),
            F.round(F.avg("_k"), 4).alias("k_avg"),
            F.max("_k").alias("k_max"),
        )
    )


@query(
    "pivot_status_qty",
    tags=("reshape",),
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
               ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — compiles to one hash
    aggregate of conditional sums. (Omitting the list triggers a
    distinct-scan job to discover values first: never at scale.)"""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )
