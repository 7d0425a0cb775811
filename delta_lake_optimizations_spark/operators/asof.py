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
    direction: str = "backward",
) -> DataFrame:
    """As-of join with pandas-``merge_asof`` direction semantics:

    - ``backward`` (default): latest right row with ``right_time <=
      left_time`` (``strict=True``: ``<``) per key;
    - ``forward``: earliest right row with ``right_time >= left_time``
      (``strict=True``: ``>``);
    - ``nearest``: whichever of the two is closer in time (ties go
      backward, matching pandas). ``strict`` excludes equal times from
      both candidates.

    ``right_cols``: right payload columns to attach (default: all except
    the key and time). Unmatched left rows keep NULL payloads — the
    left-outer semantics DuckDB's ``ASOF LEFT JOIN`` has.
    ``tolerance_seconds``: matches farther than this are nulled out.

    Cost model is unchanged across directions: ONE shuffle on the key.
    ``nearest`` adds a second window ORDERING over the same partitioning
    — an extra in-partition sort, not an extra exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
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
    unioned = tagged_left.unionByName(tagged_right)

    # right-before-left at equal times gives inclusive semantics in the
    # traversal direction; left-before-right gives strict
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w_bwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    windows = {"backward": [w_bwd], "forward": [w_fwd], "nearest": [w_bwd, w_fwd]}[
        direction
    ]
    tags = {"backward": ["b"], "forward": ["f"], "nearest": ["b", "f"]}[direction]

    carried = unioned.select(
        "__k", "__t", "__side", "__lrow",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}_{tag}")
            for w, tag in zip(windows, tags)
            for c in right_cols
        ],
        *[
            F.last("__rt", ignorenulls=True).over(w).alias(f"__rt_{tag}")
            for w, tag in zip(windows, tags)
        ],
    ).filter(F.col("__side") == 1)

    if direction == "nearest":
        gap_b = epoch_seconds(F.col("__t")) - epoch_seconds(F.col("__rt_b"))
        gap_f = epoch_seconds(F.col("__rt_f")) - epoch_seconds(F.col("__t"))
        pick_b = F.col("__rt_f").isNull() | (
            F.col("__rt_b").isNotNull() & (gap_b <= gap_f)
        )
        carried = carried.select(
            "__k", "__t", "__lrow",
            *[
                F.when(pick_b, F.col(f"__r_{c}_b")).otherwise(F.col(f"__r_{c}_f")).alias(f"__r_{c}")
                for c in right_cols
            ],
            F.when(pick_b, F.col("__rt_b")).otherwise(F.col("__rt_f")).alias("__rt"),
        )
    else:
        tag = tags[0]
        carried = carried.select(
            "__k", "__t", "__lrow",
            *[F.col(f"__r_{c}_{tag}").alias(f"__r_{c}") for c in right_cols],
            F.col(f"__rt_{tag}").alias("__rt"),
        )

    out = carried
    if tolerance_seconds is not None:
        gap = F.abs(epoch_seconds(F.col("__t")) - epoch_seconds(F.col("__rt")))
        in_tol = gap <= F.lit(float(tolerance_seconds))
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


@query(
    "events_asof_next_purchase",
    tags=("events", "asof"),
    oracle="""
        SELECT a.event_id, a.user_id, b.value AS purchase_value_next
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id AND a.ts < b.ts
    """,
)
def events_asof_next_purchase(spark, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each click annotated with the user's next strictly-
    later purchase value (attribution lookahead) — checked against
    DuckDB's native ASOF JOIN with the reversed inequality."""
    from delta_lake_optimizations_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="ts",
        strict=True, direction="forward",
    )
    return joined.select(
        "event_id", "user_id", F.col("value_asof").alias("purchase_value_next")
    )
