"""Training-data curation pipeline: the operators composed end-to-end.

The north-star use case is an LLM training-data pipeline at 100 TB; this
module is the composition layer — quality scoring, language ID, token
counting, and deduplication chained into one curation flow that lands in
a versioned GraftTable (so curation runs are time-travelable and
incremental via MERGE).

The whole pipeline is one Catalyst plan until the write: no collects, no
Python in the data path (the dedup groupBy is the only shuffle besides
the final write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.textstats import lang_id, text_quality
from delta_lake_optimizations_spark.registry import query

DEFAULT_FILTERS = {
    "min_tokens": 5,
    "max_tokens": 100_000,
    "min_alpha_ratio": 0.5,
    "max_punct_ratio": 0.2,
}


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    filters: dict | None = None,
) -> DataFrame:
    """Quality-filter + language-tag + exact-dedup a document corpus.

    Returns one row per surviving document: id, pred_lang, quality
    features, and n_copies (how many exact duplicates it represents).
    Survivor = lowest id per distinct text (deterministic).
    """
    from delta_lake_optimizations_spark.operators.dedup import spread_doc_rows
    from delta_lake_optimizations_spark.operators.textstats import (
        lang_expr,
        quality_exprs,
    )

    # r12: the per-row featurization (regex/token expressions) runs in the
    # scan stage; a single-split local corpus would serialize it on one
    # task (no-op when input splits already provide parallelism)
    docs = spread_doc_rows(docs, id_col)

    f = {**DEFAULT_FILTERS, **(filters or {})}
    # quality + lang features are pure per-row projections — computed
    # inline in ONE select (joining them back to the same scan, as a
    # naive composition would, shuffles the corpus twice for nothing; this
    # way the first shuffle in the whole pipeline is the dedup groupBy)
    scored = docs.select(
        id_col,
        text_col,
        *quality_exprs(text_col),
        lang_expr(text_col).alias("pred_lang"),
    ).filter(
        (F.col("n_tokens") >= f["min_tokens"])
        & (F.col("n_tokens") <= f["max_tokens"])
        & (F.col("alpha_ratio") >= f["min_alpha_ratio"])
        & (F.col("punct_ratio") <= f["max_punct_ratio"])
    )
    # exact dedup among survivors: keep lowest id per text hash, count
    # copies — ONE window over the content hash (single shuffle), not a
    # groupBy + join-back (two shuffles of the corpus)
    from pyspark.sql import Window as W

    wh = W.partitionBy("content_hash")
    return (
        scored.withColumn("content_hash", F.sha2(F.col(text_col), 256))
        .withColumn("rn", F.row_number().over(wh.orderBy(id_col)))
        .withColumn("n_copies", F.count(F.lit(1)).over(wh))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            "pred_lang",
            "n_tokens",
            "alpha_ratio",
            "punct_ratio",
            "stopword_ratio",
            "n_copies",
        )
    )


@query(
    "pipeline_curate_documents",
    headline=True,
    tags=("pipeline", "dedup", "text"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        feats AS (
            SELECT
                doc_id, text,
                len(t) AS n_tokens,
                ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
                      AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6) AS alpha_ratio,
                ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))
                      AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6) AS punct_ratio,
                ROUND(CAST(len(list_filter(t, x -> x IN
                    ('the','a','an','and','or','of','to','in','is','it','on','for')))
                      AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) AS stopword_ratio,
                CASE
                    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                    WHEN len(list_filter(t, x -> x IN ('the','and','of','to','is'))) = 0
                     AND len(list_filter(t, x -> x IN ('el','la','de','que','los'))) = 0
                     AND len(list_filter(t, x -> x IN ('le','les','des','est','une'))) = 0
                     AND len(list_filter(t, x -> x IN ('der','die','und','ist','das'))) = 0
                        THEN 'und'
                    WHEN len(list_filter(t, x -> x IN ('the','and','of','to','is')))
                      >= len(list_filter(t, x -> x IN ('el','la','de','que','los')))
                     AND len(list_filter(t, x -> x IN ('the','and','of','to','is')))
                      >= len(list_filter(t, x -> x IN ('le','les','des','est','une')))
                     AND len(list_filter(t, x -> x IN ('the','and','of','to','is')))
                      >= len(list_filter(t, x -> x IN ('der','die','und','ist','das')))
                        THEN 'en'
                    WHEN len(list_filter(t, x -> x IN ('el','la','de','que','los')))
                      >= len(list_filter(t, x -> x IN ('le','les','des','est','une')))
                     AND len(list_filter(t, x -> x IN ('el','la','de','que','los')))
                      >= len(list_filter(t, x -> x IN ('der','die','und','ist','das')))
                        THEN 'es'
                    WHEN len(list_filter(t, x -> x IN ('le','les','des','est','une')))
                      >= len(list_filter(t, x -> x IN ('der','die','und','ist','das')))
                        THEN 'fr'
                    ELSE 'de'
                END AS pred_lang
            FROM toks
        ),
        survivors AS (
            SELECT * FROM feats
            WHERE n_tokens BETWEEN 5 AND 100000
              AND alpha_ratio >= 0.5
              AND punct_ratio <= 0.2
        ),
        keep AS (
            SELECT sha256(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM survivors GROUP BY sha256(text)
        )
        SELECT s.doc_id, s.pred_lang, s.n_tokens, s.alpha_ratio,
               s.punct_ratio, s.stopword_ratio, k.n_copies
        FROM survivors s JOIN keep k ON s.doc_id = k.keep_id
    """,
)
def pipeline_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline over the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return curate_documents(docs)


def hash_embed(col, dim: int = 8):
    """Deterministic pseudo-embedding of a string column: ``dim`` xxhash64
    projections scaled into [-1, 1). A stand-in for a real encoder (model
    inference isn't available in this container) with the same Spark-side
    shape: pure JVM expressions, whole-stage codegen, no Python.
    """
    return F.array(
        *[
            (F.pmod(F.xxhash64(col, F.lit(d)), F.lit(1000003)) / 1000003.0) * 2 - 1
            for d in range(dim)
        ]
    )


@query("pipeline_chunk_embed", tags=("pipeline", "chunking", "vector"))
def pipeline_chunk_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingest path: chunk every document into overlapping windows and
    attach a chunk-level embedding (deterministic hash stub — swap
    ``hash_embed`` for a real encoder UDF in production; the plumbing is
    identical). Rows-only driver check; pytest pins determinism.

    Chunking is a narrow explode and the embedding is per-row expression
    work, so the whole ingest is shuffle-free — at 100 TB it runs at scan
    speed and the output partitioning follows the input, ready for an
    IVF/LSH index build as the next stage (operators/ivf.py).
    """
    from delta_lake_optimizations_spark.operators.textstats import chunk_windows

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_windows(docs, "doc_id", "text", size=500, stride=400, include_text=True)
    emb = hash_embed(F.col("chunk_text"))
    # The library form keeps array<double>; the REGISTERED query serializes
    # it to a fixed-precision CSV string because the driver's canonicalizer
    # (pandas sort_values) cannot sort list-typed cells — the round-1/round-2
    # "unhashable type: 'list'" red-row class. Guarded by
    # tests/test_registry_window.py::test_driver_window_has_no_complex_columns.
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_len",
        F.array_join(
            F.transform(emb, lambda x: F.format_number(x, 6)), ","
        ).alias("embedding_csv"),
    )
