"""Sequence packing & importance sampling for training-batch assembly
(SURVEY §2.9 extensions).

``pack_sequences`` implements concatenate-and-split packing (the
pretraining default: documents are laid out in a deterministic order and
cut into fixed token budgets; a document can straddle two packs). The
assignment is a pure function of (partition, order, token counts):
one running-sum window per shard partition — a single shuffle on the
shard key, no global ordering anywhere. At 100 TB each source/shard
packs independently, which is exactly how the training job reads them.

``importance_sample`` keeps each row with probability
``(weight / max_weight) ** (1 / temperature)``, decided by a hash of the
row key — deterministic across runs, cluster sizes, and engines (md5
parity with DuckDB makes the oracle comparison possible). Temperature
flattens (T > 1) or sharpens (T < 1) the weight distribution — the
multi-source mixing knob from the multilingual-corpus literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    partition_col: str,
    budget: int,
) -> DataFrame:
    """Assign every row a ``pack_id`` and ``pack_offset`` within its
    partition: rows are concatenated in ``order_col`` order and cut every
    ``budget`` tokens.

    ``partition_col`` is required, not optional: packing with a global
    window would funnel the corpus through one task. Pack ids are scoped
    to the partition — (partition_col, pack_id) is the batch key.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumns(
        {
            "pack_id": F.floor(cum_before / budget),
            "pack_offset": cum_before % budget,
        }
    )


def importance_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    temperature: float = 1.0,
) -> DataFrame:
    """Deterministically keep rows with probability
    ``(weight / max_weight) ** (1 / temperature)``.

    The global max is one scalar — aggregated once and broadcast via a
    1-row cross join (no per-row shuffle). The keep decision hashes the
    key to a uniform in [0, 1): reproducible sampling, no RNG state.
    """
    maxw = df.agg(F.max(weight_col).alias("_max_w"))
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        / float(1 << 32)
    )
    p = F.pow(F.col(weight_col) / F.col("_max_w"), 1.0 / temperature)
    return (
        df.crossJoin(F.broadcast(maxw))
        .withColumns({"keep_p": F.round(p, 6), "u": F.round(u, 6)})
        .filter(F.col("u") < F.col("keep_p"))
        .drop("_max_w")
    )


@query(
    "pack_documents_by_source",
    tags=("text", "packing", "llm-pipeline"),
    oracle="""
        SELECT
            doc_id,
            source,
            len(string_split(text, ' ')) AS n_tokens,
            CAST(FLOOR(
                COALESCE(SUM(len(string_split(text, ' '))) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) / 512
            ) AS BIGINT) AS pack_id,
            CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ), 0) AS BIGINT) % 512 AS pack_offset
        FROM documents
    """,
)
def pack_documents_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split packing of each source shard into 512-token
    context windows: every document gets its (pack_id, pack_offset)
    batch coordinates."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
    packed = pack_sequences(
        toks, token_col="n_tokens", order_col="doc_id",
        partition_col="source", budget=512,
    )
    return packed.select("doc_id", "source", "n_tokens", "pack_id", "pack_offset")


@query(
    "importance_sample_by_length",
    tags=("sampling", "llm-pipeline"),
    oracle="""
        WITH mx AS (SELECT MAX(n_chars) AS max_w FROM documents),
        scored AS (
            SELECT
                d.doc_id,
                d.source,
                ROUND(POW(CAST(d.n_chars AS DOUBLE) / mx.max_w, 1.0 / 2.0), 6)
                    AS keep_p,
                ROUND(CAST(CAST(CONCAT('0x', SUBSTR(
                    md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
                    / 4294967296.0, 6) AS u
            FROM documents d, mx
        )
        SELECT doc_id, source, keep_p, u
        FROM scored WHERE u < keep_p
    """,
)
def importance_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-2 importance sampling of documents weighted by length:
    longer documents kept proportionally more often, decisions replayable
    from doc_id alone."""
    docs = load_table(spark, sf_dir, "documents")
    out = importance_sample(docs, weight_col="n_chars", key_col="doc_id", temperature=2.0)
    return out.select("doc_id", "source", "keep_p", "u")
