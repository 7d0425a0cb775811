"""As-of (point-in-time) join — a time-series operator Spark lacks natively.

For every left row, attach the single right row with the greatest
``right_time`` strictly before (or at) ``left_time`` within the same key —
the classic market-data "trade gets the latest prior quote" join.

Scalable implementation (the union trick — NO range explosion, NO
per-row subquery): tag both sides, union, one window over
``(key) ORDER BY (time, side)`` where right rows sort before left rows at
equal timestamps, and ``last(col, ignorenulls=True)`` carries the latest
right payload forward onto each left row. Cost: ONE shuffle on the key —
the same as a plain equi-join — regardless of how many right rows precede
each left row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.temporal import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right_time <= left_time`` (``strict=True``: ``<``) for its key.

    ``right_cols``: right payload columns to attach (default: all except
    the key and time). Unmatched left rows keep NULL payloads — the
    left-outer semantics DuckDB's ``ASOF LEFT JOIN`` has.
    ``tolerance_seconds``: matches older than this are nulled out.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]

    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tagged_left.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_time).alias("__rt"),
    )

    # right-before-left at equal times gives inclusive (<=) semantics;
    # left-before-right gives strict (<)
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = tagged_left.unionByName(tagged_right).select(
        "__k", "__t", "__side", "__lrow",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in right_cols],
        F.last("__rt", ignorenulls=True).over(w).alias("__rt"),
    )

    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            epoch_seconds(F.col("__t")) - epoch_seconds(F.col("__rt"))
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            "__k", "__t", "__lrow", "__rt",
            *[
                F.when(in_tol, F.col(f"__r_{c}")).otherwise(F.lit(None)).alias(f"__r_{c}")
                for c in right_cols
            ],
        )
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(f"{c}_asof") for c in right_cols],
    )


from delta_lake_optimizations_spark.registry import query  # noqa: E402


@query(
    "events_asof_last_purchase",
    tags=("events", "asof"),
    oracle="""
        SELECT a.event_id, a.user_id, b.value AS purchase_value_asof
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id AND a.ts > b.ts
    """,
)
def events_asof_last_purchase(spark, sf_dir: str) -> DataFrame:
    """Each click event annotated with the user's latest strictly-prior
    purchase value — the as-of join against DuckDB's native ASOF JOIN."""
    from delta_lake_optimizations_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts", strict=True
    )
    return joined.select(
        "event_id", "user_id", F.col("value_asof").alias("purchase_value_asof")
    )
