"""CCNet-style n-gram language-model quality scoring (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): train a bigram LM on a trusted reference slice of the corpus,
score every document by perplexity under it — low perplexity ≈ looks
like the reference (kept / "head" bucket), high perplexity ≈ noise.
CCNet uses a KenLM 5-gram; the bigram form here is the same filter with
the same plumbing, kept exactly SQL-expressible so the driver oracle
value-checks it end to end.

Relation to ``quality.bigram_lm_scores``: that operator scores the
corpus under an LM trained on the corpus ITSELF (self-perplexity — a
boilerplate/noise signal with no held-out reference, inner joins, add-k
smoothing). This one is the CCNet filter proper: the LM is trained on a
trusted REFERENCE slice, so scored documents contain bigrams the LM has
never seen — which is why it needs the OOV bucket, add-one smoothing
over left joins, and the keep-rule ``perplexity_filter``.

Model (add-one smoothing with an OOV bucket, every choice mirrored in
the oracle SQL):

- tokens: lowercased whitespace split (``dedup.tokenize`` — the corpus
  gram convention shared by MinHash/Jaccard/decontam);
- ``c2(w1,w2)``: reference count of the bigram, ``c1(w1)``: count of
  bigram rows starting with ``w1`` (so conditionals sum to 1 per w1);
- ``V``: distinct reference tokens + 1 (the OOV bucket);
- ``P(w2|w1) = (c2 + 1) / (c1 + V)`` — unseen w1 degrades smoothly to
  ``1/V``, no special-casing;
- doc score: ``H = avg(-ln P)`` over the doc's bigram positions
  (multiset, via the codegen ``_gram_rows`` path), ``ppl = exp(H)``.
  Docs with <2 tokens have no bigrams and drop out of the scoring.

100 TB design: training is two hash aggregates over the reference slice
(bigram counts, first-token counts) — pure shuffle-by-key, no driver
data. Scoring is the doc-bigram stream joined to the LM on the gram
string; Catalyst/AQE broadcasts the LM when it is small and
shuffle-joins otherwise, and ``min_count`` prunes the LM's long tail
(a pruned bigram scores as unseen — smoothing absorbs it), which is
what bounds LM size on a web-scale reference. The scalar V rides a
broadcast 1-row cross join, never a ``.collect``-then-literal (a
re-plan with a baked literal would recompute the reference aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.dedup import _gram_rows, tokenize
from delta_lake_optimizations_spark.registry import query


def train_bigram_lm(
    ref: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bigram LM from the reference slice.

    Returns ``(bigrams, firsts, vocab)``:
    ``bigrams``: (_gram, c2) — bigram counts, pruned to >= min_count;
    ``firsts``: (_w1, c1) — bigram-row counts per first token (UNpruned,
    so pruning never inflates the conditional of surviving siblings);
    ``vocab``: 1-row (v) — distinct reference tokens + 1 (OOV bucket).
    """
    grams = _gram_rows(ref, id_col, text_col, n=2, short_gram=False)
    bigrams = grams.groupBy("_gram").agg(F.count(F.lit(1)).alias("c2"))
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c2") >= min_count)
    firsts = (
        _gram_rows(ref, id_col, text_col, n=2, short_gram=False)
        .select(F.split("_gram", " ").getItem(0).alias("_w1"))
        .groupBy("_w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = (
        ref.select(
            F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("_t")
        )
        .agg((F.countDistinct("_t") + F.lit(1)).alias("v"))
    )
    return bigrams, firsts, vocab


def perplexity_scores(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Per-document perplexity under the reference bigram LM:
    ``(id_col, n_bigrams, ppl)`` for every document with >= 1 bigram."""
    bigrams, firsts, vocab = train_bigram_lm(ref, id_col, text_col, min_count)
    doc_grams = _gram_rows(docs, id_col, text_col, n=2, short_gram=False).select(
        "_id",
        "_gram",
        F.split("_gram", " ").getItem(0).alias("_w1"),
    )
    scored = (
        doc_grams.join(bigrams, "_gram", "left")
        .join(firsts, "_w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            (
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
            ).alias("_nll"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.exp(F.avg("_nll")).alias("ppl"),
        )
        .select(F.col("_id").alias(id_col), "n_bigrams", "ppl")
    )


def perplexity_filter(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    max_ppl: float,
    min_count: int = 1,
) -> DataFrame:
    """CCNet's keep rule: documents whose perplexity under the reference
    LM is <= ``max_ppl`` (docs too short to score are dropped — no
    evidence either way, and CCNet's length gates remove them anyway)."""
    scores = perplexity_scores(docs, ref, id_col, text_col, min_count)
    return docs.join(
        scores.filter(F.col("ppl") <= max_ppl).select(id_col), id_col, "inner"
    )


@query(
    "lm_perplexity_scores",
    tags=("quality", "lm"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+') AS t
            FROM documents
        ),
        ref_bi AS (
            SELECT t[i.i] || ' ' || t[i.i + 1] AS gram, t[i.i] AS w1
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t))) AS i) i
            WHERE lang = 'en'
        ),
        c2 AS (SELECT gram, COUNT(*) AS c2 FROM ref_bi GROUP BY 1),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM ref_bi GROUP BY 1),
        v AS (
            SELECT COUNT(DISTINCT tok) + 1 AS v
            FROM (SELECT UNNEST(t) AS tok FROM toks WHERE lang = 'en')
        ),
        doc_bi AS (
            SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS gram, t[i.i] AS w1
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t))) AS i) i
        ),
        nll AS (
            SELECT doc_id,
                   -LN(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
                       / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)) AS nll
            FROM doc_bi
            LEFT JOIN c2 USING (gram)
            LEFT JOIN c1 USING (w1)
            CROSS JOIN v
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(EXP(AVG(nll)), 4) AS ppl
        FROM nll
        GROUP BY doc_id
    """,
)
def lm_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's perplexity under a bigram LM trained on the
    English slice — CCNet's quality signal, fully value-checked."""
    documents = load_table(spark, sf_dir, "documents")
    ref = documents.filter(F.col("lang") == "en")
    return perplexity_scores(documents, ref, "doc_id", "text").select(
        "doc_id", "n_bigrams", F.round("ppl", 4).alias("ppl")
    )
