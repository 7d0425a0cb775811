"""Benchmark decontamination: remove training documents that overlap an
evaluation set (SURVEY §2.9 extensions — the step every serious
pretraining pipeline runs between crawl and train; the GPT-3 / PaLM
papers describe exactly this n-gram-overlap form).

Shape: corpus docs and benchmark docs are both exploded into distinct
word n-grams; the benchmark gram set is tiny by definition (eval suites
are thousands of documents, not billions) so it is ``F.broadcast`` into
a map-side semi/inner join — the 100 TB corpus is never shuffled, each
task filters its own partition against the broadcast gram set. The
per-doc aggregation shuffles only (doc_id, count) pairs for the
contaminated minority.

All built-in expressions (split / transform / slice / explode) — no
Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def word_ngrams(text_col: Column, n: int) -> Column:
    """Array of word n-grams (space-joined) of ``text_col``; empty array
    for documents shorter than ``n`` tokens. ``F.sequence`` would count
    DOWN for stop < start, hence the explicit length guard."""
    toks = F.split(text_col, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def _word_gram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """``word_ngrams`` as ROWS via posexplode + window lead — identical
    gram strings (same single-space tokenizer, full n-grams only, none
    for short docs) without the interpreted transform/slice cost per gram
    (the dedup._gram_rows lesson: ~10x on the corpus-wide explode)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_t0"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    leads = toks.select(
        "_id",
        F.concat_ws(
            " ", "_t0", *[F.lead("_t0", j).over(w) for j in range(1, n)]
        ).alias("gram"),
        F.lead("_t0", n - 1).over(w).alias("_full"),
    )
    return leads.filter(F.col("_full").isNotNull()).select(
        F.col("_id").alias(id_col), "gram"
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-document count of DISTINCT word n-grams shared with the
    benchmark set. Only contaminated documents appear in the output.

    The corpus side (the big one at 100 TB) enumerates grams via
    ``_word_gram_rows``; the benchmark side stays on the array form —
    it's the broadcast-small side."""
    c_grams = _word_gram_rows(corpus, id_col, text_col, n).distinct()
    b_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    return (
        c_grams.join(F.broadcast(b_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_shared: int = 0,
) -> DataFrame:
    """Drop corpus documents sharing more than ``max_shared`` distinct
    n-grams with the benchmark (default: any overlap). Anti-join on the
    contaminated-id set, which is small — broadcast-able."""
    bad = (
        ngram_overlap(corpus, benchmark, id_col, text_col, n)
        .filter(F.col("n_shared_grams") > max_shared)
        .select(id_col)
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


@query(
    "decontam_ngram_overlap",
    tags=("text", "decontam", "llm-pipeline"),
    oracle="""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(ts, i, i + 3), ' ') AS gram
            FROM tok, UNNEST(generate_series(1, len(ts) - 3)) AS t(i)
        ),
        bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 25 = 0
        )
        SELECT g.doc_id, COUNT(*) AS n_shared_grams
        FROM grams g JOIN bench b USING (gram)
        WHERE g.doc_id % 25 <> 0
        GROUP BY g.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination report: which training docs share a word 4-gram with
    the (synthetic) benchmark slice ``doc_id % 25 == 0``, and how many.
    4-grams suit this short-doc tiny-vocab corpus; production uses 8-13
    (the operator parameter)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    return ngram_overlap(train, bench, n=4)


def embedding_decontaminate_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic (embedding-space) contamination report: for each corpus
    vector, its MAX cosine against the benchmark set; only vectors at or
    above ``threshold`` are returned.

    Complements ``ngram_overlap``: paraphrased benchmark leakage carries
    no shared n-grams but lands close in embedding space (the
    contamination mode n-gram decontamination cannot see). Same scale
    shape as the n-gram form — the benchmark side is tiny by definition,
    so it broadcasts and the corpus is scanned map-side, never shuffled;
    the aggregation shuffles only (id, partial-max) pairs.
    """
    from delta_lake_optimizations_spark.queries.vectors import cosine

    b = F.broadcast(benchmark.select(F.col(vec_col).alias("__bv")))
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .crossJoin(b)
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__bv")).alias("__cos"))
        .groupBy(id_col)
        .agg(F.round(F.max("__cos"), 6).alias("max_bench_cos"))
        .filter(F.col("max_bench_cos") >= threshold)
    )


@query(
    "decontam_embedding_similarity",
    tags=("decontam", "similarity", "llm-pipeline"),
    oracle="""
        WITH bench AS (
            SELECT embedding AS bv FROM embeddings WHERE vec_id % 50 = 0
        ),
        scored AS (
            SELECT
                e.vec_id,
                list_sum(list_transform(
                    list_zip(e.embedding, b.bv),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
                ))
                / (
                    SQRT(list_sum(list_transform(
                        e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                    )))
                    * SQRT(list_sum(list_transform(
                        b.bv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                    )))
                ) AS cos_sim
            FROM embeddings e, bench b
            WHERE e.vec_id % 50 <> 0
        )
        SELECT vec_id, ROUND(MAX(cos_sim), 6) AS max_bench_cos
        FROM scored
        GROUP BY vec_id
        HAVING ROUND(MAX(cos_sim), 6) >= 0.5
    """,
)
def decontam_embedding_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vectors semantically too close to the (synthetic) benchmark
    slice ``vec_id % 50 == 0`` — max-cosine >= 0.5 against any benchmark
    vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    return embedding_decontaminate_report(corpus, bench, threshold=0.5)



@query(
    "decontam_clean_corpus_stats",
    tags=("text", "decontam", "llm-pipeline"),
    oracle="""
        WITH tok AS (
            SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(ts, i, i + 3), ' ') AS gram
            FROM tok, UNNEST(generate_series(1, len(ts) - 3)) AS t(i)
        ),
        bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 25 = 0
        ),
        bad AS (
            SELECT DISTINCT g.doc_id
            FROM grams g JOIN bench b USING (gram)
            WHERE g.doc_id % 25 <> 0
        )
        SELECT d.source,
               COUNT(*) AS n_clean,
               CAST(SUM(d.n_chars) AS BIGINT) AS clean_chars
        FROM documents d
        WHERE d.doc_id % 25 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM bad)
        GROUP BY d.source
    """,
)
def decontam_clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-decontamination corpus profile: per source, how many documents
    and characters survive removing everything that overlaps the
    benchmark slice."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    clean = decontaminate(train, bench, n=4)
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clean"),
        F.sum("n_chars").alias("clean_chars"),
    )
