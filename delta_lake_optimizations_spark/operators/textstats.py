"""Text-analysis operators over ``documents`` (SURVEY.md §2.9 X5).

Language-ID (stopword-vote heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling shingle hash). All built-in-function expressions —
no Python UDFs — so they whole-stage-codegen and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.dedup import tokenize
from delta_lake_optimizations_spark.registry import query

# Tiny public stopword seeds per language (heuristic votes).
_LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "les", "des", "est", "une"),
    "de": ("der", "die", "und", "ist", "das"),
}

_EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for",
)

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols
# (the public GPT-2-style pre-tokenization shape, simplified to ASCII classes).
_BPEISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def quality_exprs(text_col: str) -> list[Column]:
    """The quality-feature expressions as aliased Columns — usable inline
    in any select (no join needed to attach features to a frame)."""
    toks = tokenize(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), "[.,;:!?]", ""))
    n_alpha = n_chars - F.length(F.regexp_replace(F.col(text_col), "[A-Za-z]", ""))
    n_stop = _count_in(toks, _EN_STOPWORDS)
    return [
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        F.round(n_chars.cast("double") / n_tokens.cast("double"), 6).alias(
            "mean_token_len"
        ),
        F.round(n_punct.cast("double") / n_chars.cast("double"), 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens.cast("double"), 6).alias(
            "stopword_ratio"
        ),
        F.round(n_alpha.cast("double") / n_chars.cast("double"), 6).alias("alpha_ratio"),
    ]


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring features: token/char counts, mean token length,
    punctuation ratio, stopword ratio, alpha ratio."""
    return df.select(F.col(id_col), *quality_exprs(text_col))


@query(
    "text_quality_scores",
    tags=("text",),
    oracle="""
        WITH toks AS (
            SELECT
                doc_id,
                text,
                string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        )
        SELECT
            doc_id,
            len(t) AS n_tokens,
            LENGTH(text) AS n_chars_m,
            ROUND(CAST(LENGTH(text) AS DOUBLE) / CAST(len(t) AS DOUBLE), 6)
                AS mean_token_len,
            ROUND(
                CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))
                     AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE),
                6
            ) AS punct_ratio,
            ROUND(
                CAST(len(list_filter(t, x -> x IN
                    ('the','a','an','and','or','of','to','in','is','it','on','for')))
                     AS DOUBLE) / CAST(len(t) AS DOUBLE),
                6
            ) AS stopword_ratio,
            ROUND(
                CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
                     AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE),
                6
            ) AS alpha_ratio
        FROM toks
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features for pipeline filtering."""
    documents = load_table(spark, sf_dir, "documents")
    return text_quality(documents, "doc_id", "text")


def lang_expr(text_col: str) -> Column:
    """Heuristic language-ID expression: CJK-character presence, else most
    stopword votes (ties broken by fixed language order), else 'und'."""
    toks = tokenize(F.col(text_col))
    votes = {lang: _count_in(toks, words) for lang, words in _LANG_STOPWORDS.items()}
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")

    best = F.lit("und")
    best_votes = F.lit(0)
    # Fixed priority order: earlier languages win ties (> not >=).
    for lang in ("en", "es", "fr", "de"):
        is_better = votes[lang] > best_votes
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_votes = F.when(is_better, votes[lang]).otherwise(best_votes)
    return F.when(has_cjk, F.lit("zh")).otherwise(best)


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language ID as a frame: id + pred_lang."""
    return df.select(F.col(id_col), lang_expr(text_col).alias("pred_lang"))


@query(
    "text_lang_id",
    tags=("text",),
    oracle="""
        WITH scored AS (
            SELECT
                doc_id,
                regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk,
                len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x IN ('the','and','of','to','is'))) AS v_en,
                len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x IN ('el','la','de','que','los'))) AS v_es,
                len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x IN ('le','les','des','est','une'))) AS v_fr,
                len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x IN ('der','die','und','ist','das'))) AS v_de
            FROM documents
        )
        SELECT
            doc_id,
            CASE
                WHEN has_cjk THEN 'zh'
                WHEN v_en = 0 AND v_es = 0 AND v_fr = 0 AND v_de = 0 THEN 'und'
                WHEN v_en >= v_es AND v_en >= v_fr AND v_en >= v_de THEN 'en'
                WHEN v_es >= v_fr AND v_es >= v_de THEN 'es'
                WHEN v_fr >= v_de THEN 'fr'
                ELSE 'de'
            END AS pred_lang
        FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language identification."""
    documents = load_table(spark, sf_dir, "documents")
    return lang_id(documents, "doc_id", "text")


@query(
    "token_count_bpeish",
    tags=("text",),
    oracle="""
        SELECT
            doc_id,
            len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
            len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS n_bpeish_tokens
        FROM documents
    """,
)
def token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    pre-tokenizer (letter runs / digit runs / single symbols)."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPEISH_PATTERN), 0)).alias(
            "n_bpeish_tokens"
        ),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, shingle: int = 8) -> DataFrame:
    """Document fingerprint: minimum 64-bit hash over rolling character
    shingles (the winnowing/MinHash-of-shingles pattern with w=all).

    Identical texts (and texts sharing their minimal shingle) collide —
    useful as a cheap near-dup blocking key.
    """
    txt = F.lower(F.trim(F.col(text_col)))
    n = F.length(txt)
    starts = F.sequence(F.lit(1), F.greatest(n - shingle + 1, F.lit(1)))
    shingle_hashes = F.transform(starts, lambda i: F.xxhash64(F.substring(txt, i, shingle)))
    return df.select(
        F.col(id_col),
        F.array_min(shingle_hashes).alias("fingerprint"),
        F.size(shingle_hashes).alias("n_shingles"),
    )


@query("doc_fingerprint", tags=("text", "approx"))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-shingle-hash fingerprints (rows-only driver check; pytest
    pins determinism and collision-on-duplicate behaviour)."""
    documents = load_table(spark, sf_dir, "documents")
    return fingerprint(documents, "doc_id", "text").orderBy("doc_id")


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 500,
    stride: int = 400,
    include_text: bool = False,
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows — the
    standard pre-embedding chunking step of an LLM data pipeline.

    Pure generate+explode: ``sequence`` builds the chunk starts per row,
    ``posexplode`` fans them out, ``substring`` slices — all JVM-side
    whole-stage codegen, no shuffle at all (narrow transformation), so at
    100 TB it streams through the scan at I/O speed.

    ``include_text=True`` adds the chunk text itself (``chunk_text``) for
    feeding an embedding stage; the default keeps only the content hash,
    which is what profiling/dedup needs and avoids re-materializing the
    corpus.
    """
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunk = F.substring(F.col(text_col), F.col("chunk_start") + 1, size)
    cols = [
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    ]
    if include_text:
        cols.append(chunk.alias("chunk_text"))
    return (
        df.filter(n > 0)
        .select(F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_idx", "chunk_start"))
        .select(*cols)
    )


@query(
    "doc_chunk_windows",
    tags=("text", "chunking", "pipeline"),
    oracle="""
        SELECT
            doc_id,
            CAST(cs / 400 AS BIGINT) AS chunk_idx,
            CAST(cs AS BIGINT) AS chunk_start,
            CAST(length(substr(text, CAST(cs + 1 AS BIGINT), 500)) AS BIGINT) AS chunk_len,
            md5(substr(text, CAST(cs + 1 AS BIGINT), 500)) AS chunk_md5
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(length(text) AS BIGINT), 400)) AS cs
            FROM documents
            WHERE length(text) > 0
        )
    """,
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """500-char chunks with 100-char overlap (stride 400) over every
    document; chunks identified by content hash so the oracle compares
    values without shipping the chunk text itself."""
    documents = load_table(spark, sf_dir, "documents")
    return chunk_windows(documents, "doc_id", "text", size=500, stride=400)


@query(
    "seq_length_histogram",
    tags=("text", "profiling", "pipeline"),
    oracle="""
        SELECT
            CAST(FLOOR(len(string_split_regex(trim(text), '\\s+')) / 16)
                 * 16 AS BIGINT) AS bucket_lo,
            COUNT(*) AS n_docs,
            CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                AS total_tokens
        FROM documents
        GROUP BY 1
    """,
)
def seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution in width-16 token buckets — the input
    to packing/truncation planning (what fraction of the corpus exceeds a
    context length; how much padding a given max_len costs).

    One hash aggregate on a derived int key: map-side combinable, output
    rows bounded by max_tokens/16, independent of corpus size."""
    documents = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    return (
        documents.select(
            (F.floor(n_tokens / 16) * 16).cast("long").alias("bucket_lo"),
            n_tokens.alias("_n"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("long").alias("total_tokens"),
        )
    )


@query(
    "zipf_top_tokens",
    tags=("text", "vocabulary"),
    oracle="""
        SELECT token, term_freq, rank FROM (
            SELECT token,
                   term_freq,
                   ROW_NUMBER() OVER (ORDER BY term_freq DESC, token) AS rank
            FROM (
                SELECT token, COUNT(*) AS term_freq
                FROM (
                    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                           AS token
                    FROM documents
                )
                WHERE token <> ''
                GROUP BY token
            )
        )
        WHERE rank <= 20
    """,
)
def zipf_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens with their Zipf rank (deterministic tie-break on the
    token itself) — the head of the frequency curve tokenizer and stopword
    decisions are made from.

    Explode + hash aggregate, then a single-partition window over ONLY the
    aggregated vocabulary (bounded by distinct-token count, not corpus
    size) — the window never sees row-level data, so the funnel is safe at
    any corpus scale."""
    from pyspark.sql import Window

    documents = load_table(spark, sf_dir, "documents")
    freqs = (
        documents.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    w = Window.orderBy(F.desc("term_freq"), F.asc("token"))
    return (
        freqs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )


@query(
    "corpus_datacard",
    tags=("text", "agg"),
    oracle="""
        SELECT
            COALESCE(lang, '<all>') AS lang,
            COALESCE(source, '<all>') AS source,
            COUNT(*) AS n_docs,
            CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                AS n_tokens,
            CAST(SUM(length(text)) AS BIGINT) AS n_chars,
            ROUND(AVG(len(string_split_regex(trim(text), '\\s+'))), 4)
                AS avg_doc_tokens,
            ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents), 6)
                AS doc_share
        FROM documents
        GROUP BY ROLLUP (lang, source)
    """,
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card aggregate every corpus release publishes: doc /
    token / char totals and shares at three grains — per (lang, source),
    per lang, and grand total — in ONE pass via ROLLUP (a single hash
    aggregate computing all grouping sets; three separate GROUP BYs would
    triple the scan). NULL grouping keys are labeled '<all>' so the
    output is a plain readable table (and hash-stable vs the oracle)."""
    documents = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    total = documents.count()  # metadata-sized scalar for the share column
    return (
        documents.rollup("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok).alias("n_tokens"),
            F.sum(F.length("text")).alias("n_chars"),
            F.round(F.avg(n_tok), 4).alias("avg_doc_tokens"),
            F.round(F.count("*") / F.lit(float(total)), 6).alias("doc_share"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "n_docs",
            "n_tokens",
            "n_chars",
            "avg_doc_tokens",
            "doc_share",
        )
    )
