"""Event-time queries over the ``events`` table (SURVEY.md §2.8 last rows).

Batch event-time windowing with ``F.window`` — the Structured Streaming
variant of the same aggregation lives in
``delta_lake_optimizations_spark.streaming.events_stream`` (same logical
plan, incremental execution).

DuckDB-oracle note: Spark's tumbling windows are epoch-aligned, so the
oracle computes the bucket with explicit epoch arithmetic
(``make_timestamp(floor(epoch(ts)/600)*600 * 1e6)``) rather than relying on
``time_bucket`` origin conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query
from delta_lake_optimizations_spark.temporal import epoch_seconds


@query(
    "events_tumbling_window",
    headline=True,
    tags=("events", "window-agg"),
    oracle="""
        SELECT
            make_timestamp(CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) * 1000000)
                AS window_start,
            event_type,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling-window aggregation by event type."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sessionize",
    tags=("events", "session"),
    oracle="""
        WITH flagged AS (
            SELECT
                user_id,
                ts,
                CASE
                    WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800 THEN 1
                    ELSE 0
                END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT
            user_id,
            CAST(SUM(new_session) AS BIGINT) AS n_sessions,
            COUNT(*) AS n_events
        FROM flagged
        GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (lag + cumulative flag).

    The classic batch pattern — Window.lag to detect gaps, sum of flags as
    session count. Scales as a single shuffle on user_id.
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Microsecond-exact gap: cast(timestamp as double) = fractional epoch
    # seconds in both Spark and DuckDB (epoch()), so the >1800 comparison
    # can't disagree on sub-second boundaries.
    gap_sec = epoch_seconds(F.col("ts")) - epoch_seconds(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_sec > 1800), 1).otherwise(0)
    return (
        events.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_type_pivot",
    tags=("events", "pivot"),
    oracle="""
        SELECT
            user_id,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_purchase,
            ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
                AS purchase_value
        FROM events
        GROUP BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot (conditional aggregation) of event counts per user."""
    events = load_table(spark, sf_dir, "events")
    n_of = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
    return events.groupBy("user_id").agg(
        n_of("click").alias("n_click"),
        n_of("view").alias("n_view"),
        n_of("purchase").alias("n_purchase"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 2
        ).alias("purchase_value"),
    )


@query(
    "events_session_window",
    tags=("events", "session"),
    oracle="""
        WITH flagged AS (
            SELECT
                user_id,
                event_id,
                ts,
                value,
                CASE
                    WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= 1800 THEN 1
                    ELSE 0
                END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT *, SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING
            ) AS session_id
            FROM flagged
        )
        SELECT
            user_id,
            MIN(ts) AS session_start,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS session_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rows via Spark's native ``F.session_window`` operator
    (30-minute gap): one row per (user, session) with start/size/value.

    This is the built-in operator form of ``events_sessionize`` — the same
    logical op Structured Streaming runs incrementally with state. Spark
    merges events whose gap is < 30 min, so a gap of exactly 1800 s starts a
    new session (window is ``[start, start+gap)``); the oracle's island SQL
    uses ``>= 1800`` to match. One shuffle on user_id.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "events_sliding_window",
    tags=("events", "window-agg"),
    oracle="""
        SELECT
            make_timestamp(ws * 1000000) AS window_start,
            event_type,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM (
            SELECT
                event_type,
                value,
                unnest([
                    CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT),
                    CAST(FLOOR(epoch(ts) / 300) * 300 - 300 AS BIGINT)
                ]) AS ws
            FROM events
        )
        GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) 10-minute windows every 5 minutes by event type.

    Each event lands in exactly 600/300 = 2 windows; Spark expands then
    hash-aggregates (map-side partial, one shuffle). The oracle unnests the
    two epoch-aligned candidate starts explicitly — both always qualify
    because ts - start < 300 + 300 = 600 s.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_resample_gapfill",
    tags=("events", "window-agg", "timeseries"),
    oracle="""
        WITH bounds AS (
            SELECT CAST(FLOOR(epoch(MIN(ts)) / 3600) * 3600 AS BIGINT) AS t0,
                   CAST(FLOOR(epoch(MAX(ts)) / 3600) * 3600 AS BIGINT) AS t1
            FROM events
        ),
        grid AS (
            SELECT DISTINCT e.event_type, g.ws
            FROM events e
            CROSS JOIN (
                SELECT unnest(range(t0, t1 + 3600, 3600)) AS ws FROM bounds
            ) g
        ),
        actual AS (
            SELECT event_type,
                   CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS ws,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS total
            FROM events GROUP BY 1, 2
        )
        SELECT grid.event_type,
               make_timestamp(grid.ws * 1000000) AS window_start,
               COALESCE(n, 0) AS n_events,
               COALESCE(total, 0.0) AS total_value
        FROM grid LEFT JOIN actual
          ON grid.event_type = actual.event_type AND grid.ws = actual.ws
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with GAP FILLING: every (event_type, hour) cell of
    the time grid appears, zero-filled where no events landed — the
    time-series densification step dashboards and downstream models need
    (a bare GROUP BY silently drops empty buckets).

    Plan shape: the observed aggregate is one hash aggregate; the grid is
    a 1-row bounds aggregate exploded via ``sequence`` (hours x types —
    grid cardinality, not data cardinality) broadcast-joined back. At
    100 TB the grid stays tiny while the fact side never shuffles twice.
    """
    events = load_table(spark, sf_dir, "events")
    ws = (F.floor(epoch_seconds(F.col("ts")) / 3600) * 3600).cast("long")
    actual = (
        events.withColumn("ws", ws)
        .groupBy("event_type", "ws")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
    bounds = events.agg(
        (F.floor(epoch_seconds(F.min("ts")) / 3600) * 3600).cast("long").alias("t0"),
        (F.floor(epoch_seconds(F.max("ts")) / 3600) * 3600).cast("long").alias("t1"),
    )
    hours = bounds.select(
        F.explode(F.sequence(F.col("t0"), F.col("t1"), F.lit(3600))).alias("ws")
    )
    grid = events.select("event_type").distinct().crossJoin(F.broadcast(hours))
    return (
        grid.join(actual, ["event_type", "ws"], "left")
        .select(
            "event_type",
            F.timestamp_seconds(F.col("ws")).alias("window_start"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "events_transition_matrix",
    tags=("events", "markov", "analytics"),
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive event types per user
    (journey analysis): one shuffle on user_id for the LEAD ordering, a
    tiny (|types|^2-row) aggregation after — the classic funnel-discovery
    primitive at any scale."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
