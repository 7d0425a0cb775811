"""Interval (range) join: pair rows whose timestamps fall within a window.

``left ⋈ right ON key AND right_time BETWEEN left_time - before AND
left_time + after`` — the "events near an order" shape. Vanilla Spark
plans a pure inequality join as a broadcast-nested-loop (O(n*m) and
driver-memory-bound); the scalable re-expression is the classic
**bucketized band join**:

1. quantize both sides' times into buckets of width ``before + after``;
2. replicate each LEFT row into the buckets its window can touch (at
   most 2 when the window fits one bucket width — bounded fan-out,
   NOT data-dependent);
3. equi-join on (key, bucket) — a normal shuffled hash join;
4. re-apply the exact band predicate as a post-join filter.

Cost: one shuffle on (key, bucket) with ≤2x left duplication — versus a
nested loop that never finishes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.temporal import epoch_seconds


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    before_seconds: float = 0.0,
    after_seconds: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with equal ``on`` key and
    ``right_time ∈ [left_time - before, left_time + after]``.

    Output: every left column + every right column (right's key column is
    dropped; clashing names get an ``_r`` suffix).
    """
    if before_seconds < 0 or after_seconds < 0:
        raise ValueError("window bounds must be non-negative")
    width = max(before_seconds + after_seconds, 1.0)

    lt = epoch_seconds(F.col(left_time))
    rt = epoch_seconds(F.col(right_time))

    # rename clashing right columns (except the join key, which merges)
    clashes = (set(left.columns) & set(right.columns)) - {on}
    r = right
    for c in clashes:
        r = r.withColumnRenamed(c, f"{c}_r")
    right_time_out = f"{right_time}_r" if right_time in clashes else right_time
    rt_out = epoch_seconds(F.col(right_time_out))

    # left row covers buckets floor((t-before)/w) .. floor((t+after)/w):
    # at most 2 distinct buckets since after+before <= w
    lo = F.floor((lt - F.lit(before_seconds)) / F.lit(width)).cast("long")
    hi = F.floor((lt + F.lit(after_seconds)) / F.lit(width)).cast("long")
    l_bucketed = left.withColumn(
        "__bkt", F.explode(F.array_distinct(F.array(lo, hi)))
    )
    r_bucketed = r.withColumn("__bkt", F.floor(rt_out / F.lit(width)).cast("long"))

    band = (rt_out >= epoch_seconds(F.col(left_time)) - F.lit(before_seconds)) & (
        rt_out <= epoch_seconds(F.col(left_time)) + F.lit(after_seconds)
    )
    return (
        l_bucketed.join(r_bucketed, [on, "__bkt"], how)
        .filter(band)
        .drop("__bkt")
    )


from delta_lake_optimizations_spark.registry import query  # noqa: E402


@query(
    "events_interval_join_purchases",
    tags=("events", "range-join"),
    oracle="""
        SELECT a.event_id AS click_id, b.event_id AS purchase_id,
               b.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id
         AND epoch(b.ts) >= epoch(a.ts)
         AND epoch(b.ts) <= epoch(a.ts) + 3600
    """,
)
def events_interval_join_purchases(spark, sf_dir: str) -> DataFrame:
    """Purchases within an hour AFTER each click by the same user —
    the bucketized band join vs DuckDB's native inequality join."""
    from delta_lake_optimizations_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        F.col("value").alias("purchase_value"),
    )
    joined = interval_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="pts",
        before_seconds=0.0, after_seconds=3600.0,
    )
    return joined.select("click_id", "purchase_id", "purchase_value")
