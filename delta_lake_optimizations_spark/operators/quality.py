"""Repetition / n-gram / redaction operators over ``documents`` (SURVEY
§2.9 X5 extensions — the Gopher-style quality-filter signals and the
corpus-level n-gram statistics an LLM-data pipeline runs before training).

All three are pure built-in-function plans (whole-stage codegen, no
Python in the data path):

- per-document repetition scores stay entirely within the row (array
  lambdas over the token list — zero shuffle, linear scan);
- corpus n-gram counts are one explode + one hash aggregate (map-side
  partial combine collapses the per-partition duplicates before the
  single shuffle; top-k is a tiny sorted tail);
- PII redaction is regexp_replace / regexp_extract_all over each row
  (patterns kept to the RE2-compatible subset so the DuckDB oracle can
  run the identical regex).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.dedup import tokenize
from delta_lake_optimizations_spark.registry import query

# RE2-and-Java-compatible PII patterns (no lookarounds, no backrefs).
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_PATTERN = "\\b[0-9]{3}-[0-9]{4}\\b"


def _bigrams(toks: Column) -> Column:
    """Adjacent-token bigrams as 'a b' strings (empty array below 2 tokens)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_exprs(text_col: str) -> list[Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    'Scaling Language Models' §A1.1, public arXiv:2112.11446): the
    fraction of duplicated words and the fraction of tokens covered by
    the single most-repeated bigram. High values mark boilerplate /
    degenerate documents that quality filters drop before training."""
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    bg = _bigrams(toks)
    # max multiplicity of any bigram, computed row-locally (docs are short;
    # distinct-x-filter is O(d*n) inside codegen, no shuffle)
    top_bg_count = F.when(
        F.size(bg) >= 1,
        F.array_max(
            F.transform(
                F.array_distinct(bg),
                lambda x: F.size(F.filter(bg, lambda y: y == x)),
            )
        ),
    ).otherwise(F.lit(0))
    return [
        n.alias("n_tokens"),
        F.round(1.0 - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"), 6).alias(
            "dup_word_fraction"
        ),
        F.round(
            F.when(n >= 2, (2.0 * top_bg_count.cast("double")) / n.cast("double")).otherwise(0.0),
            6,
        ).alias("top_bigram_fraction"),
    ]


@query(
    "text_repetition_scores",
    tags=("text", "quality"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        bg AS (
            SELECT doc_id, t,
                   CASE WHEN len(t) >= 2
                        THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                        ELSE [] END AS b
            FROM toks
        )
        SELECT doc_id,
               len(t) AS n_tokens,
               ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                   AS dup_word_fraction,
               ROUND(CASE WHEN len(t) >= 2 THEN
                   2.0 * list_max(list_transform(list_distinct(b),
                                  x -> len(list_filter(b, y -> y = x)))) / len(t)
                   ELSE 0.0 END, 6) AS top_bigram_fraction
        FROM bg
    """,
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals (duplicate-word fraction,
    top-bigram coverage) — row-local array lambdas, zero shuffle."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select("doc_id", *repetition_exprs("text"))


@query(
    "corpus_top_bigrams",
    tags=("text", "ngram"),
    oracle="""
        WITH toks AS (
            SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        bg AS (
            SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
                   AS bigram
            FROM toks WHERE len(t) >= 2
        )
        SELECT bigram, COUNT(*) AS cnt
        FROM bg
        GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 20
    """,
)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level most-frequent word bigrams: explode + one hash
    aggregate (map-side partial combine) + tiny top-k tail. At 100 TB
    this is the canonical 'global n-gram counts' job — one shuffle on
    the bigram key, skew absorbed by the partial aggregation."""
    documents = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    return (
        documents.select(F.explode(_bigrams(toks)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(20)
    )


@query(
    "pii_redaction_counts",
    tags=("text", "redaction"),
    oracle=f"""
        WITH enriched AS (
            SELECT doc_id,
                   text || ' contact: user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or call 555-' ||
                        CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS n_emails,
               len(regexp_extract_all(text, '{PHONE_PATTERN}')) AS n_phones,
               LENGTH(regexp_replace(regexp_replace(text,
                   '{EMAIL_PATTERN}', '[EMAIL]', 'g'),
                   '{PHONE_PATTERN}', '[PHONE]', 'g')) AS redacted_len
        FROM enriched
    """,
)
def pii_redaction_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training data: count and replace email/phone
    patterns. The corpus is synthetic, so a deterministic contact line is
    appended first (identically in the oracle) — the assertion is that
    the redaction regexes actually fire, not that the corpus is dirty."""
    documents = load_table(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(enriched, EMAIL_PATTERN, "[EMAIL]"), PHONE_PATTERN, "[PHONE]"
    )
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(enriched, F.lit(EMAIL_PATTERN), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(enriched, F.lit(PHONE_PATTERN), 0)).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
    )


@query(
    "corpus_vocabulary",
    tags=("text", "vocabulary", "pipeline"),
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
            FROM documents
        )
        SELECT token,
               COUNT(*) AS term_freq,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM toks
        WHERE token <> ''
        GROUP BY token
        HAVING COUNT(*) >= 5
    """,
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: corpus-wide term and document frequencies for
    every token seen at least 5 times — the input to tokenizer training,
    IDF weighting, and stopword discovery.

    Explode + one hash aggregate; term_freq is map-side combinable, and
    doc_freq's COUNT(DISTINCT) rides the same shuffle on the token key
    (partial distinct within partitions under AQE). The min-count HAVING
    prunes the long hapax tail before any driver collect."""
    documents = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    return (
        documents.select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("term_freq") >= 5)
    )


@query(
    "dataset_card_by_source",
    tags=("text", "profiling", "pipeline"),
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
               COUNT(DISTINCT lang) AS n_langs,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY source
    """,
)
def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card profile per corpus source: volume, length moments,
    language spread — the summary a curation pipeline publishes per slice.

    One hash aggregate over integer columns; the mean is exact integer
    SUM/COUNT divided as identical doubles on both sides, so no float
    drift. At 100 TB each source's card is a handful of counters — fully
    map-side combinable, shuffle carries one row per source."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# Fixed, documented weights for the linear quality classifier — the
# public fastText/C4-style "quality filter as tiny linear model" shape
# with heuristic-feature inputs instead of a learned embedding (no model
# weights ship in this sandbox; the plumbing and math are production
# form: JVM-side features -> linear score -> sigmoid -> threshold).
QUALITY_CLF_WEIGHTS = {
    "bias": -3.0,
    "stopword_ratio": 5.0,  # natural prose has function words
    "alpha_ratio": 3.0,  # mostly-letters beats symbol soup
    "punct_ratio": -10.0,  # punctuation walls are boilerplate-ish
    "log1p_tokens": 0.4,  # longer docs carry more signal
    "token_len_dev": -0.15,  # mean token length far from ~5 is noise
}


def quality_classifier(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Logistic quality score + keep decision per document.

    Features come from :func:`..textstats.quality_exprs` (pure built-in
    expressions, whole-stage codegen); the score is a fixed-weight
    linear model through a sigmoid. Zero shuffles, zero Python in the
    data path — at 100 TB this is a map-only pass fused into the scan.
    """
    from delta_lake_optimizations_spark.operators.textstats import quality_exprs

    w = QUALITY_CLF_WEIGHTS
    feats = df.select(F.col(id_col), *quality_exprs(text_col))
    z = (
        F.lit(w["bias"])
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["alpha_ratio"]) * F.col("alpha_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["log1p_tokens"]) * F.log(F.lit(1.0) + F.col("n_tokens"))
        + F.lit(w["token_len_dev"]) * F.abs(F.col("mean_token_len") - F.lit(5.0))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return feats.select(
        F.col(id_col),
        "n_tokens",
        "stopword_ratio",
        "alpha_ratio",
        "punct_ratio",
        score.alias("quality_score"),
        (score >= 0.5).alias("kept"),
    )


@query(
    "quality_classifier_scores",
    tags=("text", "pipeline"),
    oracle="""
        WITH feats AS (
            SELECT
                doc_id,
                len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
                ROUND(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    x -> x IN ('the','a','an','and','or','of','to','in','is','it','on','for')))
                    AS DOUBLE) / CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS DOUBLE), 6) AS stopword_ratio,
                ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
                    AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6) AS alpha_ratio,
                ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))
                    AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6) AS punct_ratio,
                ROUND(CAST(LENGTH(text) AS DOUBLE) /
                    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE), 6)
                    AS mean_token_len
            FROM documents
        ),
        scored AS (
            SELECT *,
                ROUND(1.0 / (1.0 + EXP(-(
                    -3.0
                    + 5.0 * stopword_ratio
                    + 3.0 * alpha_ratio
                    - 10.0 * punct_ratio
                    + 0.4 * LN(1.0 + n_tokens)
                    - 0.15 * ABS(mean_token_len - 5.0)
                ))), 4) AS quality_score
            FROM feats
        )
        SELECT doc_id, n_tokens, stopword_ratio, alpha_ratio, punct_ratio,
               quality_score, quality_score >= 0.5 AS kept
        FROM scored
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight logistic quality classifier over ``documents`` —
    the trainable-filter shape (features -> linear -> sigmoid ->
    threshold) with deterministic public-heuristic weights."""
    documents = load_table(spark, sf_dir, "documents")
    return quality_classifier(documents, "doc_id", "text")


# ---------------------------------------------------------------------------
# TRAINED quality classifier (VERDICT r08 #6): same features, same
# map-only scoring pass — but the logistic weights are FIT in-Spark
# (fastText-style supervised filter, public Joulin et al. 2016 shape)
# against weak labels instead of hand-set constants.
# ---------------------------------------------------------------------------

#: Feature order is the model contract — weights store/restore by name.
QUALITY_FEATURES = (
    "stopword_ratio",
    "alpha_ratio",
    "punct_ratio",
    "log1p_tokens",
    "token_len_dev",
)

#: Table property carrying fitted weights (the centroid/codebook pattern:
#: model artifacts ride the table metadata, scoring needs no side file).
QUALITY_WEIGHTS_PROP = "graft.quality.weights"

# Sidecar shared with the DuckDB oracle (the BPE vocab pattern): the
# registered trained-classifier query WRITES (name, weight) rows eagerly,
# the oracle READS them to restate the scoring pass independently.
# Keyed by pid+start-time and cleaned at exit (same hygiene as the BPE
# sidecar after the r08 ADVICE fix).
import atexit as _atexit
import os as _os
import shutil as _shutil
import tempfile as _tempfile

from delta_lake_optimizations_spark.operators.bpe import _proc_key

_QUALITY_SIDECAR_DIR = _os.path.join(
    _tempfile.gettempdir(), f"spark_graft_quality_{_proc_key()}"
)
QUALITY_WEIGHTS_SIDECAR = _os.path.join(_QUALITY_SIDECAR_DIR, "weights.parquet")
_atexit.register(_shutil.rmtree, _QUALITY_SIDECAR_DIR, ignore_errors=True)


def _feature_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, label-ready feature columns) — the 5 model inputs derived
    from ``quality_exprs`` (6-dp-rounded ratios, so Spark and the oracle
    score identical doubles)."""
    from delta_lake_optimizations_spark.operators.textstats import quality_exprs

    return df.select(F.col(id_col), *quality_exprs(text_col)).select(
        F.col(id_col),
        "n_tokens",
        "stopword_ratio",
        "alpha_ratio",
        "punct_ratio",
        F.log(F.lit(1.0) + F.col("n_tokens")).alias("log1p_tokens"),
        F.abs(F.col("mean_token_len") - F.lit(5.0)).alias("token_len_dev"),
    )


def fit_logistic(
    feats: DataFrame,
    feature_cols: tuple[str, ...] = QUALITY_FEATURES,
    label_col: str = "label",
    n_iters: int = 60,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> dict[str, float]:
    """Batch gradient descent for logistic regression where EVERY step is
    one Spark aggregate — the distributed fit shape: gradient_j =
    avg((sigmoid(w.x) - y) * x_j) is a map-side-combining hash aggregate
    over the (cached, ~48 bytes/row) feature frame, so a 100 TB corpus
    trains in n_iters scans of a slim projected cache, no driver data.

    Features standardize to zero-mean/unit-variance for conditioning
    (one stats aggregate), and the learned weights FOLD the
    standardization back out before returning, so scoring stays a raw-
    feature map-only expression. Weights round to 8 dp at this single
    choke point — the stored model and any restatement (the DuckDB
    oracle) score bit-comparable doubles."""
    import math

    stats = feats.agg(
        *[F.avg(c).alias(f"mu_{c}") for c in feature_cols],
        *[F.stddev_pop(c).alias(f"sd_{c}") for c in feature_cols],
    ).collect()[0]
    mu = {c: float(stats[f"mu_{c}"]) for c in feature_cols}
    sd = {c: max(float(stats[f"sd_{c}"] or 0.0), 1e-9) for c in feature_cols}
    std = feats.select(
        F.col(label_col).cast("double").alias("_y"),
        *[((F.col(c) - F.lit(mu[c])) / F.lit(sd[c])).alias(c) for c in feature_cols],
    ).cache()
    try:
        std.count()  # materialize once; every GD step reuses the cache
        w = {c: 0.0 for c in feature_cols}
        b = 0.0
        for _ in range(n_iters):
            z = F.lit(b)
            for c in feature_cols:
                z = z + F.lit(w[c]) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("_y")
            g = std.agg(
                F.avg(err).alias("g_bias"),
                *[F.avg(err * F.col(c)).alias(f"g_{c}") for c in feature_cols],
            ).collect()[0]
            b -= lr * float(g["g_bias"])
            for c in feature_cols:
                w[c] -= lr * (float(g[f"g_{c}"]) + l2 * w[c])
    finally:
        std.unpersist()
    raw = {c: w[c] / sd[c] for c in feature_cols}
    raw_bias = b - math.fsum(w[c] * mu[c] / sd[c] for c in feature_cols)
    out = {c: round(v, 8) for c, v in raw.items()}
    out["bias"] = round(raw_bias, 8)
    return out


def weak_quality_labels(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Weak labels from the corpus bigram LM (the CCNet bucketing move):
    label 1 for documents at or above the median average log-probability
    (plausible prose under the corpus's own statistics), 0 below.
    Deterministic: avg_logp is 4-dp rounded and the median is exact."""
    scores = bigram_lm_scores(df, id_col, text_col)
    med = scores.agg(
        F.expr("percentile(avg_logp, 0.5)").alias("m")
    ).collect()[0]["m"]
    return scores.select(
        id_col,
        (F.col("avg_logp") >= F.lit(float(med))).cast("int").alias("label"),
    )


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    labels: DataFrame | None = None,
    n_iters: int = 60,
    lr: float = 1.0,
) -> dict[str, float]:
    """Fit the quality classifier's weights on this corpus: features from
    ``quality_exprs``, labels supplied or derived (``weak_quality_labels``).
    Returns the raw-feature weight dict (keys = QUALITY_FEATURES + bias)."""
    if labels is None:
        labels = weak_quality_labels(df, id_col, text_col)
    feats = _feature_frame(df, id_col, text_col).join(labels, id_col)
    return fit_logistic(feats, n_iters=n_iters, lr=lr)


def store_quality_weights(table, weights: dict[str, float]) -> None:
    """Persist fitted weights as a table property (JSON) — the same home
    as IVF centroids / PQ codebooks; DESCRIBE EXTENDED shows the model."""
    import json

    table.set_properties({QUALITY_WEIGHTS_PROP: json.dumps(weights, sort_keys=True)})


def load_quality_weights(table) -> dict[str, float]:
    import json

    return json.loads(table.snapshot().properties[QUALITY_WEIGHTS_PROP])


def quality_classifier_with_weights(
    df: DataFrame, id_col: str, text_col: str, weights: dict[str, float]
) -> DataFrame:
    """Score with an explicit weight dict — the same map-only plan as
    ``quality_classifier`` (which uses the fixed public-heuristic
    weights); trained weights plug in here."""
    feats = _feature_frame(df, id_col, text_col)
    z = F.lit(weights["bias"])
    for c in QUALITY_FEATURES:
        z = z + F.lit(weights[c]) * F.col(c)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return feats.select(
        F.col(id_col),
        "n_tokens",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        score.alias("quality_score"),
        (score >= 0.5).alias("kept"),
    )


@query(
    "quality_classifier_trained",
    tags=("text", "pipeline", "ml"),
    oracle=f"""
        WITH w AS (
            SELECT name, weight
            FROM read_parquet('{QUALITY_WEIGHTS_SIDECAR}/*.parquet')
        ),
        toks AS (
            SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        feats AS (
            SELECT doc_id,
                   len(t) AS n_tokens,
                   ROUND(CAST(len(list_filter(t,
                       x -> x IN ('the','a','an','and','or','of','to','in','is','it','on','for')))
                       AS DOUBLE) / len(t), 6) AS stopword_ratio,
                   ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
                       AS DOUBLE) / LENGTH(text), 6) AS alpha_ratio,
                   ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))
                       AS DOUBLE) / LENGTH(text), 6) AS punct_ratio,
                   LN(1.0 + len(t)) AS log1p_tokens,
                   ABS(ROUND(CAST(LENGTH(text) AS DOUBLE) / len(t), 6) - 5.0)
                       AS token_len_dev
            FROM toks
        ),
        scored AS (
            SELECT doc_id, n_tokens, stopword_ratio,
                ROUND(1.0 / (1.0 + EXP(-(
                    (SELECT weight FROM w WHERE name = 'bias')
                    + (SELECT weight FROM w WHERE name = 'stopword_ratio') * stopword_ratio
                    + (SELECT weight FROM w WHERE name = 'alpha_ratio') * alpha_ratio
                    + (SELECT weight FROM w WHERE name = 'punct_ratio') * punct_ratio
                    + (SELECT weight FROM w WHERE name = 'log1p_tokens') * log1p_tokens
                    + (SELECT weight FROM w WHERE name = 'token_len_dev') * token_len_dev
                ))), 4) AS quality_score
            FROM feats
        )
        SELECT doc_id, n_tokens, stopword_ratio, quality_score,
               quality_score >= 0.5 AS kept
        FROM scored
    """,
)
def quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED logistic quality classifier: weak labels from the corpus
    bigram LM (median avg-logp split), weights fit by distributed
    gradient descent (every step one hash aggregate over a cached slim
    feature frame), then one map-only scoring pass. The fitted weights
    are written to the sidecar the oracle reads, so DuckDB independently
    restates the ENTIRE scoring pass — features, linear term, sigmoid,
    threshold — from the stored model (training itself is pinned by the
    separable-fixture convergence pytest)."""
    documents = load_table(spark, sf_dir, "documents")
    weights = train_quality_classifier(documents, "doc_id", "text")
    rows = [(k, float(v)) for k, v in sorted(weights.items())]
    spark.createDataFrame(rows, "name string, weight double").coalesce(
        1
    ).write.mode("overwrite").parquet(QUALITY_WEIGHTS_SIDECAR)
    return quality_classifier_with_weights(documents, "doc_id", "text", weights)


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-proxy scoring against a corpus bigram LM — the CCNet
    shape (language-model scoring for quality bucketing) with the LM
    trained ON the corpus itself instead of external model weights
    (none ship in this sandbox; the dataflow is the production one).

    ``avg_logp`` = mean over a document's bigrams of
    ``ln((c(w1,w2) + 0.1) / (c(w1) + 0.1 * V))`` (add-k smoothing);
    low values = improbable token sequences = noise/boilerplate.

    Scale: bigram/unigram counts are hash aggregates with map-side
    combine; the score join is an equi-join on the bigram key. At 100 TB
    the LM table itself gets pruned to top-k bigrams plus a default
    probability before the join — the count tables here are already the
    mergeable representation that pruning would consume.
    """
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"), F.slice(toks, 2, n - 1).alias("w2")
    )
    grams = (
        df.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("g"))
        .select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    bg = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    ug = grams.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    vocab = grams.agg(F.countDistinct("w1").alias("v"))
    logp = F.log(
        (F.col("cb") + F.lit(0.1)) / (F.col("cu") + F.lit(0.1) * F.col("v"))
    )
    return (
        grams.join(bg, ["w1", "w2"])
        .join(ug, ["w1"])
        .crossJoin(F.broadcast(vocab))  # 1-row LM constant
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
        )
    )


@query(
    "bigram_lm_perplexity",
    tags=("text", "pipeline", "lm"),
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(t[1:len(t)-1]) AS w1,
                   unnest(t[2:len(t)]) AS w2
            FROM toks WHERE len(t) >= 2
        ),
        bg AS (SELECT w1, w2, COUNT(*) AS cb FROM grams GROUP BY w1, w2),
        ug AS (SELECT w1, COUNT(*) AS cu FROM grams GROUP BY w1),
        vocab AS (SELECT COUNT(DISTINCT w1) AS v FROM grams)
        SELECT g.doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(AVG(LN((cb + 0.1) / (cu + 0.1 * v))), 4) AS avg_logp
        FROM grams g JOIN bg USING (w1, w2) JOIN ug USING (w1) CROSS JOIN vocab
        GROUP BY g.doc_id
    """,
)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram-LM average log-probability per document."""
    documents = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(documents, "doc_id", "text")


@query(
    "token_entropy_scores",
    tags=("text", "quality"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        )
        SELECT doc_id,
               len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               ROUND(-list_sum(list_transform(list_distinct(t),
                   x -> (CAST(len(list_filter(t, y -> y = x)) AS DOUBLE) / len(t))
                        * LN(CAST(len(list_filter(t, y -> y = x)) AS DOUBLE) / len(t))
               )), 4) AS token_entropy
        FROM toks
    """,
)
def token_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    lexical-diversity quality signal (low entropy = repetitive/template
    text; pairs with the Gopher repetition fractions).

    Fully row-local: distinct tokens, per-token counts, and the entropy
    fold are array lambdas inside codegen — zero shuffle, fused into the
    scan. (For book-length documents, switch to the explode + two hash
    aggregates shape instead of the O(distinct x n) in-row count.)"""
    documents = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n = F.size(toks)
    distinct = F.array_distinct(toks)
    p = lambda x: F.size(F.filter(toks, lambda y: y == x)).cast("double") / n  # noqa: E731
    entropy = -F.aggregate(
        F.transform(distinct, lambda x: p(x) * F.log(p(x))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return documents.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(distinct).alias("n_distinct"),
        F.round(entropy, 4).alias("token_entropy"),
    )
