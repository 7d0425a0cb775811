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

# ---------------------------------------------------------------------------
# Trigram LM with stupid backoff (VERDICT r06 #4). Brants et al. 2007,
# "Large Language Models in Machine Translation": at web scale, skip
# proper discount/normalization and score
#
#     S(w3 | w1 w2) = c3(w1 w2 w3) / c2(w1 w2)            if c3 > 0
#                   = a * c2(w2 w3) / c1(w2)              elif c2(w2 w3) > 0
#                   = a^2 * (c1(w3) + 1) / (N + V)        otherwise
#
# with a = 0.4 (the paper's constant). The last line folds the paper's
# unigram level c1(w3)/N together with an add-one OOV floor (same V =
# distinct tokens + 1 convention as the bigram module), so unseen words
# degrade smoothly instead of hitting -ln 0. S is a score, not a
# normalized probability ("stupid" is the paper's own word for exactly
# this shortcut) — exp(avg -ln S) is therefore a perplexity-LIKE
# quality signal, comparable across documents under the same LM, which
# is all the CCNet-style filter needs.
#
# 100 TB design, same as the bigram LM: training is three hash
# aggregates over the reference slice (trigram / bigram / unigram
# counts); scoring joins the document trigram stream to the three count
# tables on their gram keys (AQE broadcasts small LMs, shuffle-joins
# big ones); ``min_count`` prunes the trigram table's long tail — the
# dominant LM-size term — and a pruned trigram simply backs off, which
# is the semantics pruning SHOULD have in this model (the paper ships
# count cutoffs for the same reason). N and V ride one broadcast 1-row
# cross join.
# ---------------------------------------------------------------------------

BACKOFF_ALPHA = 0.4


def train_backoff_lm(
    ref: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Count tables for the stupid-backoff trigram LM.

    Returns ``(trigrams, bigrams, unigrams, scalars)``:
    ``trigrams``: (_gram3, c3) pruned to >= min_count;
    ``bigrams``: (_gram2, c2) UNpruned (it is both the trigram
    denominator and the backoff numerator — pruning it would inflate
    surviving trigram conditionals);
    ``unigrams``: (_w, c1) UNpruned;
    ``scalars``: 1 row (n, v) — total reference tokens and distinct + 1.
    """
    trigrams = (
        _gram_rows(ref, id_col, text_col, n=3, short_gram=False)
        .groupBy(F.col("_gram").alias("_gram3"))
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    if min_count > 1:
        trigrams = trigrams.filter(F.col("c3") >= min_count)
    bigrams = (
        _gram_rows(ref, id_col, text_col, n=2, short_gram=False)
        .groupBy(F.col("_gram").alias("_gram2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    toks = ref.select(
        F.explode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias("_w")
    )
    unigrams = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("c1"))
    scalars = toks.agg(
        F.count(F.lit(1)).alias("n"),
        (F.countDistinct("_w") + F.lit(1)).alias("v"),
    )
    return trigrams, bigrams, unigrams, scalars


def backoff_scores(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
    alpha: float = BACKOFF_ALPHA,
) -> DataFrame:
    """Per-document stupid-backoff score: ``(id_col, n_trigrams, ppl)``
    for every document with >= 1 trigram position (< 3 tokens -> no
    evidence, dropped — same convention as the bigram scorer)."""
    trigrams, bigrams, unigrams, scalars = train_backoff_lm(
        ref, id_col, text_col, min_count
    )
    parts = F.split("_gram", " ")
    doc_tri = _gram_rows(docs, id_col, text_col, n=3, short_gram=False).select(
        "_id",
        F.col("_gram").alias("_gram3"),
        F.concat_ws(" ", parts.getItem(0), parts.getItem(1)).alias("_p2"),
        F.concat_ws(" ", parts.getItem(1), parts.getItem(2)).alias("_s2"),
        parts.getItem(1).alias("_w2"),
        parts.getItem(2).alias("_w3"),
    )
    joined = (
        doc_tri.join(trigrams, "_gram3", "left")
        .join(
            bigrams.select(F.col("_gram2").alias("_p2"), F.col("c2").alias("c2p")),
            "_p2",
            "left",
        )
        .join(
            bigrams.select(F.col("_gram2").alias("_s2"), F.col("c2").alias("c2s")),
            "_s2",
            "left",
        )
        .join(
            unigrams.select(F.col("_w").alias("_w2"), F.col("c1").alias("c1w2")),
            "_w2",
            "left",
        )
        .join(
            unigrams.select(F.col("_w").alias("_w3"), F.col("c1").alias("c1w3")),
            "_w3",
            "left",
        )
        .crossJoin(F.broadcast(scalars))
    )
    score = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2p"))
        .when(
            F.col("c2s").isNotNull(),
            F.lit(alpha) * F.col("c2s") / F.col("c1w2"),
        )
        .otherwise(
            F.lit(alpha * alpha)
            * (F.coalesce(F.col("c1w3"), F.lit(0)) + F.lit(1))
            / (F.col("n") + F.col("v"))
        )
    )
    return (
        joined.select("_id", (-F.log(score)).alias("_nll"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.exp(F.avg("_nll")).alias("ppl"),
        )
        .select(F.col("_id").alias(id_col), "n_trigrams", "ppl")
    )


def backoff_filter(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    max_ppl: float,
    min_count: int = 1,
) -> DataFrame:
    """Keep documents whose stupid-backoff score is <= ``max_ppl``
    (too-short docs drop, as in ``perplexity_filter``)."""
    scores = backoff_scores(docs, ref, id_col, text_col, min_count)
    return docs.join(
        scores.filter(F.col("ppl") <= max_ppl).select(id_col), id_col, "inner"
    )


# ---------------------------------------------------------------------------
# 4-gram stupid backoff (VERDICT r07 #4): one more order of the same
# Brants et al. cascade — CCNet's KenLM reference uses 4-5-gram models,
# and each added order measurably sharpens the filter on longer
# dependencies. Same pruning semantics: ``min_count`` prunes ONLY the
# top (4-gram) table — a pruned 4-gram backs off, exactly the paper's
# count-cutoff behavior; all lower orders stay unpruned because they
# serve as denominators.
#
#     S(w4 | w1 w2 w3) = c4(w1..w4) / c3(w1 w2 w3)        if c4 > 0
#                      = a   * c3(w2 w3 w4) / c2(w2 w3)   elif c3 > 0
#                      = a^2 * c2(w3 w4)    / c1(w3)      elif c2 > 0
#                      = a^3 * (c1(w4) + 1) / (N + V)     otherwise
# ---------------------------------------------------------------------------


def train_backoff4_lm(
    ref: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Count tables for the 4-gram stupid-backoff LM: four hash
    aggregates over the reference gram streams plus the 1-row scalars.
    Only the 4-gram table is pruned (see module comment)."""
    fourgrams = (
        _gram_rows(ref, id_col, text_col, n=4, short_gram=False)
        .groupBy(F.col("_gram").alias("_gram4"))
        .agg(F.count(F.lit(1)).alias("c4"))
    )
    if min_count > 1:
        fourgrams = fourgrams.filter(F.col("c4") >= min_count)
    trigrams, bigrams, unigrams, scalars = train_backoff_lm(
        ref, id_col, text_col, min_count=1
    )
    return fourgrams, trigrams, bigrams, unigrams, scalars


def backoff4_scores(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
    alpha: float = BACKOFF_ALPHA,
) -> DataFrame:
    """Per-document 4-gram stupid-backoff score: ``(id_col, n_fourgrams,
    ppl)`` for every document with >= 1 4-gram position (< 4 tokens ->
    no evidence, dropped). Scoring is the gram stream left-joined to the
    four count tables (AQE broadcasts small LMs); N and V ride one
    broadcast 1-row cross join."""
    fourgrams, trigrams, bigrams, unigrams, scalars = train_backoff4_lm(
        ref, id_col, text_col, min_count
    )
    parts = F.split("_gram", " ")
    doc_four = _gram_rows(docs, id_col, text_col, n=4, short_gram=False).select(
        "_id",
        F.col("_gram").alias("_gram4"),
        F.concat_ws(
            " ", parts.getItem(0), parts.getItem(1), parts.getItem(2)
        ).alias("_p3"),
        F.concat_ws(
            " ", parts.getItem(1), parts.getItem(2), parts.getItem(3)
        ).alias("_s3"),
        F.concat_ws(" ", parts.getItem(1), parts.getItem(2)).alias("_m2"),
        F.concat_ws(" ", parts.getItem(2), parts.getItem(3)).alias("_s2"),
        parts.getItem(2).alias("_w3"),
        parts.getItem(3).alias("_w4"),
    )
    joined = (
        doc_four.join(fourgrams, "_gram4", "left")
        .join(
            trigrams.select(F.col("_gram3").alias("_p3"), F.col("c3").alias("c3p")),
            "_p3",
            "left",
        )
        .join(
            trigrams.select(F.col("_gram3").alias("_s3"), F.col("c3").alias("c3s")),
            "_s3",
            "left",
        )
        .join(
            bigrams.select(F.col("_gram2").alias("_m2"), F.col("c2").alias("c2m")),
            "_m2",
            "left",
        )
        .join(
            bigrams.select(F.col("_gram2").alias("_s2"), F.col("c2").alias("c2s")),
            "_s2",
            "left",
        )
        .join(
            unigrams.select(F.col("_w").alias("_w3"), F.col("c1").alias("c1w3")),
            "_w3",
            "left",
        )
        .join(
            unigrams.select(F.col("_w").alias("_w4"), F.col("c1").alias("c1w4")),
            "_w4",
            "left",
        )
        .crossJoin(F.broadcast(scalars))
    )
    score = (
        F.when(F.col("c4").isNotNull(), F.col("c4") / F.col("c3p"))
        .when(
            F.col("c3s").isNotNull(),
            F.lit(alpha) * F.col("c3s") / F.col("c2m"),
        )
        .when(
            F.col("c2s").isNotNull(),
            F.lit(alpha * alpha) * F.col("c2s") / F.col("c1w3"),
        )
        .otherwise(
            F.lit(alpha ** 3)
            * (F.coalesce(F.col("c1w4"), F.lit(0)) + F.lit(1))
            / (F.col("n") + F.col("v"))
        )
    )
    return (
        joined.select("_id", (-F.log(score)).alias("_nll"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_fourgrams"),
            F.exp(F.avg("_nll")).alias("ppl"),
        )
        .select(F.col("_id").alias(id_col), "n_fourgrams", "ppl")
    )


@query(
    "lm_backoff4_scores",
    tags=("quality", "lm"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+') AS t
            FROM documents
        ),
        ref_four AS (
            SELECT t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2]
                   || ' ' || t[i.i + 3] AS gram
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t) - 2)) AS i) i
            WHERE lang = 'en'
        ),
        ref_tri AS (
            SELECT t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS gram
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t) - 1)) AS i) i
            WHERE lang = 'en'
        ),
        ref_bi AS (
            SELECT t[i.i] || ' ' || t[i.i + 1] AS gram
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t))) AS i) i
            WHERE lang = 'en'
        ),
        ref_uni AS (
            SELECT UNNEST(t) AS w FROM toks WHERE lang = 'en'
        ),
        c4 AS (SELECT gram, COUNT(*) AS c4 FROM ref_four GROUP BY 1),
        c3 AS (SELECT gram, COUNT(*) AS c3 FROM ref_tri GROUP BY 1),
        c2 AS (SELECT gram, COUNT(*) AS c2 FROM ref_bi GROUP BY 1),
        c1 AS (SELECT w, COUNT(*) AS c1 FROM ref_uni GROUP BY 1),
        nv AS (
            SELECT COUNT(*) AS n, COUNT(DISTINCT w) + 1 AS v FROM ref_uni
        ),
        doc_four AS (
            SELECT doc_id,
                   t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2]
                       || ' ' || t[i.i + 3] AS g4,
                   t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS p3,
                   t[i.i + 1] || ' ' || t[i.i + 2] || ' ' || t[i.i + 3] AS s3,
                   t[i.i + 1] || ' ' || t[i.i + 2] AS m2,
                   t[i.i + 2] || ' ' || t[i.i + 3] AS s2,
                   t[i.i + 2] AS w3,
                   t[i.i + 3] AS w4
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t) - 2)) AS i) i
        ),
        nll AS (
            SELECT doc_id,
                   -LN(CASE
                       WHEN c4.c4 IS NOT NULL THEN
                           CAST(c4.c4 AS DOUBLE) / c3p.c3
                       WHEN c3s.c3 IS NOT NULL THEN
                           0.4 * CAST(c3s.c3 AS DOUBLE) / c2m.c2
                       WHEN c2s.c2 IS NOT NULL THEN
                           0.16 * CAST(c2s.c2 AS DOUBLE) / c1w3.c1
                       ELSE
                           0.064 * CAST(COALESCE(c1w4.c1, 0) + 1 AS DOUBLE)
                               / (nv.n + nv.v)
                   END) AS nll
            FROM doc_four
            LEFT JOIN c4 ON doc_four.g4 = c4.gram
            LEFT JOIN c3 c3p ON doc_four.p3 = c3p.gram
            LEFT JOIN c3 c3s ON doc_four.s3 = c3s.gram
            LEFT JOIN c2 c2m ON doc_four.m2 = c2m.gram
            LEFT JOIN c2 c2s ON doc_four.s2 = c2s.gram
            LEFT JOIN c1 c1w3 ON doc_four.w3 = c1w3.w
            LEFT JOIN c1 c1w4 ON doc_four.w4 = c1w4.w
            CROSS JOIN nv
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_fourgrams,
               ROUND(EXP(AVG(nll)), 4) AS ppl
        FROM nll
        GROUP BY doc_id
    """,
)
def lm_backoff4_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's 4-gram stupid-backoff score under an LM trained
    on the English slice — one order above ``lm_backoff_scores``, the
    KenLM-adjacent depth CCNet actually runs; the DuckDB oracle restates
    the full 4-level cascade independently."""
    documents = load_table(spark, sf_dir, "documents")
    ref = documents.filter(F.col("lang") == "en")
    return backoff4_scores(documents, ref, "doc_id", "text").select(
        "doc_id", "n_fourgrams", F.round("ppl", 4).alias("ppl")
    )


@query(
    "lm_backoff_scores",
    tags=("quality", "lm"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+') AS t
            FROM documents
        ),
        ref_tri AS (
            SELECT t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS gram
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t) - 1)) AS i) i
            WHERE lang = 'en'
        ),
        ref_bi AS (
            SELECT t[i.i] || ' ' || t[i.i + 1] AS gram
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t))) AS i) i
            WHERE lang = 'en'
        ),
        ref_uni AS (
            SELECT UNNEST(t) AS w FROM toks WHERE lang = 'en'
        ),
        c3 AS (SELECT gram, COUNT(*) AS c3 FROM ref_tri GROUP BY 1),
        c2 AS (SELECT gram, COUNT(*) AS c2 FROM ref_bi GROUP BY 1),
        c1 AS (SELECT w, COUNT(*) AS c1 FROM ref_uni GROUP BY 1),
        nv AS (
            SELECT COUNT(*) AS n, COUNT(DISTINCT w) + 1 AS v FROM ref_uni
        ),
        doc_tri AS (
            SELECT doc_id,
                   t[i.i] || ' ' || t[i.i + 1] || ' ' || t[i.i + 2] AS g3,
                   t[i.i] || ' ' || t[i.i + 1] AS p2,
                   t[i.i + 1] || ' ' || t[i.i + 2] AS s2,
                   t[i.i + 1] AS w2,
                   t[i.i + 2] AS w3
            FROM toks,
                 LATERAL (SELECT UNNEST(range(1, len(t) - 1)) AS i) i
        ),
        nll AS (
            SELECT doc_id,
                   -LN(CASE
                       WHEN c3.c3 IS NOT NULL THEN
                           CAST(c3.c3 AS DOUBLE) / c2p.c2
                       WHEN c2s.c2 IS NOT NULL THEN
                           0.4 * CAST(c2s.c2 AS DOUBLE) / c1w2.c1
                       ELSE
                           0.16 * CAST(COALESCE(c1w3.c1, 0) + 1 AS DOUBLE)
                               / (nv.n + nv.v)
                   END) AS nll
            FROM doc_tri
            LEFT JOIN c3 ON doc_tri.g3 = c3.gram
            LEFT JOIN c2 c2p ON doc_tri.p2 = c2p.gram
            LEFT JOIN c2 c2s ON doc_tri.s2 = c2s.gram
            LEFT JOIN c1 c1w2 ON doc_tri.w2 = c1w2.w
            LEFT JOIN c1 c1w3 ON doc_tri.w3 = c1w3.w
            CROSS JOIN nv
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               ROUND(EXP(AVG(nll)), 4) AS ppl
        FROM nll
        GROUP BY doc_id
    """,
)
def lm_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's stupid-backoff trigram score under an LM trained
    on the English slice — the higher-order form of the CCNet filter,
    fully value-checked against the oracle's independent SQL restatement
    of the same backoff cascade."""
    documents = load_table(spark, sf_dir, "documents")
    ref = documents.filter(F.col("lang") == "en")
    return backoff_scores(documents, ref, "doc_id", "text").select(
        "doc_id", "n_trigrams", F.round("ppl", 4).alias("ppl")
    )
