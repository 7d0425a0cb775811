"""Product-analytics queries over the events/documents tables: ordered
funnels, cohort retention, and text normalization — the behavioral-
analytics surface (complementing the event-time windows in
``queries/events.py``).

Scale notes: every query here shuffles at most twice on ``user_id`` (a
key whose cardinality grows with the data, so partitions stay balanced)
or is embarrassingly map-only; nothing funnels through a partitionless
window or a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel timestamps: for each user, the first time they
    completed stage k STRICTLY AFTER their stage k-1 time. Returns one row
    per user with a nullable ``t_<stage>`` column per stage.

    Each stage is one groupBy on the user key (conditional min), chained
    by a user-key join — all shuffles share the ``user_col`` partitioning,
    so at 100 TB the chain is k co-partitioned aggregations, no
    re-shuffle between them once AQE reuses the exchange.
    """
    cur = events.filter(F.col(type_col) == stages[0]).groupBy(user_col).agg(
        F.min(ts_col).alias(f"t_{stages[0]}")
    )
    for prev, stage in zip(stages, stages[1:]):
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(user_col, F.col(ts_col).alias("__t"))
            .join(cur.select(user_col, f"t_{prev}"), user_col)
            .filter(F.col("__t") > F.col(f"t_{prev}"))
            .groupBy(user_col)
            .agg(F.min("__t").alias(f"t_{stage}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


@query(
    "events_funnel_conversion",
    tags=("events", "funnel", "analytics"),
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewed,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clicked,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchased
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel: how many users completed
    each stage after the previous one (strict event-time ordering)."""
    events = load_table(spark, sf_dir, "events")
    f = funnel_stages(events, ["view", "click", "purchase"])
    return f.agg(
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"),
    )


@query(
    "events_daily_retention",
    tags=("events", "retention", "analytics"),
    oracle="""
        WITH first_seen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
            FROM events GROUP BY user_id
        )
        SELECT
            STRFTIME(f.d0, '%Y-%m-%d') AS cohort_date,
            DATE_DIFF('day', f.d0, CAST(e.ts AS DATE)) AS day_offset,
            CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
)
def events_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention triangle: users bucketed by first-seen
    date, activity counted per day offset. Two shuffles (user agg + the
    cohort/offset agg); the user join is co-partitioned with the first
    aggregation. Dates emitted as yyyy-MM-dd strings (driver-canonical
    form)."""
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    return (
        events.select("user_id", F.to_date("ts").alias("d"))
        .join(first_seen, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "d0").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "text_normalize_clean",
    tags=("text", "normalize", "llm-pipeline"),
    oracle="""
        SELECT
            doc_id,
            TRIM(REGEXP_REPLACE(
                REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                ' +', ' ', 'g'
            )) AS norm_text_head,
            LENGTH(TRIM(REGEXP_REPLACE(
                REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                ' +', ' ', 'g'
            ))) AS norm_len
        FROM documents
    """,
)
def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization for dedup/tokenization pre-passes:
    lowercase, non-alphanumerics to spaces, whitespace collapsed. Pure
    JVM expressions (whole-stage codegen, map-only — scan speed at any
    scale). The ASCII character class keeps the regex dialect-portable
    between Java regex and the oracle's RE2."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text_head"),
        F.length(norm).alias("norm_len"),
    )
