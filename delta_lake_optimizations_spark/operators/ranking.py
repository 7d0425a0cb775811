"""Scalable global ranking: exact total-order ranks without a global window.

``Window.orderBy()`` with no partition key moves EVERY row through one
task (Spark warns: "No Partition Defined for Window operation") — a
non-starter at 100 TB. These operators produce the same exact results with
the classic two-pass distributed sort:

1. ``repartitionByRange`` on the order columns (sampled range boundaries,
   parallel) + ``sortWithinPartitions`` — a normal distributed sort;
2. one tiny count-per-partition job (driver gets P integers) to compute
   cumulative offsets;
3. ``mapInPandas`` adds ``offset + local_index`` per partition — Arrow
   batches stream in sorted order, no further shuffle.

The sorted frame is persisted between the two passes because range
boundaries are sampled: recomputation could re-draw boundaries and
misalign the offsets with the rank pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def _order_cols(order_by: list[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def global_rank(
    df: DataFrame,
    order_by: list[str | Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number under a total order.

    ``order_by`` must be a unique ordering (include a key tiebreaker) —
    same contract a deterministic ``ROW_NUMBER() OVER (ORDER BY ...)``
    needs. Returns ``df`` + ``rank_col`` (long).
    """
    spark = df.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = _order_cols(order_by)

    keyed = (
        df.repartitionByRange(P, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()

    counts = {r["__pid"]: r["cnt"] for r in keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(keyed.schema.fields + [T.StructField(rank_col, T.LongType())])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                pdf[rank_col] = pd.Series([], dtype="int64")
                yield pdf
                continue
            pid = int(pdf["__pid"].iloc[0])
            start = offsets.get(pid, 0) + seen.get(pid, 0)
            pdf[rank_col] = range(start + 1, start + 1 + len(pdf))
            seen[pid] = seen.get(pid, 0) + len(pdf)
            yield pdf

    return keyed.mapInPandas(assign, out_schema).drop("__pid")


def ntile_exact(
    df: DataFrame,
    n: int,
    order_by: list[str | Column],
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``NTILE(n) OVER (ORDER BY ...)`` without a global window.

    SQL NTILE semantics: with ``rows`` total rows, the first
    ``rows % n`` buckets get ``rows // n + 1`` rows, the rest ``rows // n``.
    Computed from :func:`global_rank`, so it scales like a distributed sort.
    """
    ranked = global_rank(df, order_by, rank_col="__gr", num_partitions=num_partitions)
    # total row count as a broadcast one-row frame (no driver round trip);
    # bucket arithmetic in exact integer `div` — float division could
    # misbucket at large ranks
    total_df = ranked.agg(F.count(F.lit(1)).alias("__total"))
    bucket = F.expr(
        f"""CAST(CASE
            WHEN __gr <= (__total % {n}) * ((__total div {n}) + 1)
            THEN (__gr - 1) div ((__total div {n}) + 1)
            ELSE (__total % {n})
                 + ((__gr - 1) - (__total % {n}) * ((__total div {n}) + 1))
                   div greatest(__total div {n}, 1)
        END + 1 AS INT)"""
    ).alias(bucket_col)
    return ranked.crossJoin(F.broadcast(total_df)).select(
        *[c for c in ranked.columns if c != "__gr"], bucket
    )


@query(
    "global_rank_events",
    tags=("window", "rank", "scale"),
    oracle="""
        SELECT event_id,
               CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS rank
        FROM events
    """,
)
def global_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global ROW_NUMBER over all events by (ts, event_id) — computed
    with the two-pass distributed sort (range partition + per-partition
    offsets), NEVER a partitionless Window (which funnels every row through
    one task). The oracle IS the partitionless window, so the driver proves
    result equivalence of the scalable plan."""
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    ranked = global_rank(events, order_by=["ts", "event_id"], rank_col="rank")
    return ranked.select("event_id", "rank")


@query(
    "ntile_exact_buckets",
    tags=("window", "ntile", "scale"),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               NTILE(16) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                   AS bucket
        FROM lineitem
    """,
)
def ntile_exact_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(16) over the whole lineitem table by price (unique tiebreak
    order), via the distributed global rank — same results as the SQL
    window, no single-task global sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    bucketed = ntile_exact(
        li, 16, order_by=["l_extendedprice", "l_orderkey", "l_linenumber"]
    )
    return bucketed.select("l_orderkey", "l_linenumber", "bucket")
