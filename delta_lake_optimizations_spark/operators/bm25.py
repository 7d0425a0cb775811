"""BM25 keyword retrieval over the documents corpus (text-search operator
for the LLM-data-pipeline surface — Robertson/Sparck-Jones BM25, the
public-standard ranking function).

Fully distributed shape: tokenize → explode → per-(doc, term) TF, per-term
DF — two hash aggregations — then score query terms via a broadcast join
(the query term list is tiny) and sum per document. No UDFs; every step is
built-in expressions, so it codegens and scales linearly in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.dedup import tokenize
from delta_lake_optimizations_spark.registry import query

K1 = 1.2
B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Score every document containing at least one query term.

    Returns (id, score) ordered by score desc. IDF uses the standard
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` smoothing.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokenize(F.col(text_col))).alias("_t"),
    )
    doc_len = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_dl"))
    tf = toks.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("_tf"))

    n_docs_df = docs.agg(F.count(F.lit(1)).alias("_n"))
    avg_dl_df = doc_len.agg(F.avg("_dl").alias("_avgdl"))

    qterms = docs.sparkSession.createDataFrame(
        [(t.lower(),) for t in query_terms], "_t string"
    )
    df_per_term = (
        tf.join(F.broadcast(qterms), "_t")
        .groupBy("_t")
        .agg(F.countDistinct("_id").alias("_df"))
    )

    scored = (
        tf.join(F.broadcast(qterms), "_t")
        .join(F.broadcast(df_per_term), "_t")
        .join(doc_len, "_id")
        .join(F.broadcast(n_docs_df))
        .join(F.broadcast(avg_dl_df))
    )
    idf = F.log(
        1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_part = (
        F.col("_tf") * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    return (
        scored.withColumn("_s", idf * tf_part)
        .groupBy("_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select(F.col("_id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
    )


@query(
    "bm25_keyword_search",
    tags=("text", "search"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS t
            FROM documents
        ),
        doc_len AS (
            SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
        ),
        tf AS (
            SELECT doc_id, t, COUNT(*) AS tf FROM toks
            WHERE t IN ('data', 'learning', 'model')
            GROUP BY doc_id, t
        ),
        stats AS (
            SELECT (SELECT COUNT(*) FROM documents) AS n,
                   (SELECT AVG(dl) FROM doc_len) AS avgdl
        ),
        df_t AS (
            SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t
        )
        SELECT tf.doc_id,
               ROUND(SUM(
                   LN(1.0 + (s.n - df_t.df + 0.5) / (df_t.df + 0.5))
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf
        JOIN df_t ON tf.t = df_t.t
        JOIN doc_len dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s
        GROUP BY tf.doc_id
        ORDER BY score DESC, tf.doc_id
    """,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking for the query terms ('data', 'learning', 'model')."""
    from delta_lake_optimizations_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, ["data", "learning", "model"])
