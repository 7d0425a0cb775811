"""Two-pass Misra-Gries heavy hitters: exact frequent items WITHOUT
shuffling the full token stream.

A naive ``GROUP BY token HAVING count > threshold`` shuffles every token
occurrence — at 100 TB with billions of distinct tokens that shuffle IS
the job. The classic alternative (Misra-Gries '82, the deterministic
frequent-items summary):

1. **Candidate pass (map-only)**: each partition runs a k-counter
   Misra-Gries summary over its tokens via ``mapInPandas`` — O(k) memory,
   one sequential scan, NO shuffle. MG guarantees each partition
   undercounts any item by at most ``n_p / k``; summed over partitions the
   global undercount is at most ``n / k``, so every item with true count
   > ``n / k`` survives into some partition's candidate set.
2. **Exact pass (candidate-bounded shuffle)**: broadcast-semi-join the
   token stream against the candidate set (candidates number at most
   k x partitions — tiny) and exactly count ONLY those tokens. The final
   filter keeps items above the user threshold.

With ``k >= 2 / fraction`` the candidate pass provably cannot drop a
true heavy hitter, so the output is EXACTLY the items with
``count > fraction * total`` with exact counts — byte-equal to the
full-shuffle SQL, verified by the driver oracle — while the shuffle
volume is bounded by the candidate list, not the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def _misra_gries_candidates(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition k-counter MG summaries -> union of candidate tokens.
    Output: one row per (partition, candidate) — at most k x partitions
    rows, metadata-sized."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeros (dict comprehension
                    # beats per-key deletes at k of thousands)
                    counters = {c: n - 1 for c, n in counters.items() if n > 1}
        yield pd.DataFrame({col: list(counters.keys())})

    return tokens.mapInPandas(summarize, schema=f"{col} string")


def frequent_items(
    df: DataFrame,
    token_col: Column,
    fraction: float,
    k_per_partition: int | None = None,
) -> DataFrame:
    """Items occurring in more than ``fraction`` of the exploded token
    stream, with EXACT counts (see module docstring for the two-pass
    guarantee). Returns ``(token, n)`` — deterministic, oracle-equal to
    the full GROUP BY."""
    k = k_per_partition or max(16, int(2.0 / fraction) + 1)
    tokens = df.select(token_col.alias("token")).filter(F.col("token") != "")
    candidates = _misra_gries_candidates(tokens, "token", k).distinct()
    total = tokens.count()
    threshold = fraction * total
    exact = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
    )
    return exact


@query(
    "frequent_tokens_heavy_hitters",
    tags=("text", "sketch", "vocabulary"),
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
            FROM documents
        ),
        nonempty AS (SELECT token FROM tok WHERE token <> ''),
        tot AS (SELECT COUNT(*) AS n FROM nonempty)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM nonempty, tot
        GROUP BY token, tot.n
        HAVING COUNT(*) > 0.002 * tot.n
    """,
)
def frequent_tokens_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens covering >0.2% of the corpus token stream — computed by the
    two-pass Misra-Gries plan, result provably identical to the oracle's
    full GROUP BY (stopword discovery at corpus scale)."""
    from delta_lake_optimizations_spark.operators.textstats import tokenize

    documents = load_table(spark, sf_dir, "documents")
    return frequent_items(
        documents.select(F.explode(tokenize(F.col("text"))).alias("tok")),
        F.col("tok"),
        fraction=0.002,
    )
