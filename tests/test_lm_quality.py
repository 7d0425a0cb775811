"""CCNet-style bigram-LM perplexity: reference docs score lower than
noise, OOV degrades smoothly, min_count pruning only raises scores, and
the filter keeps the low-perplexity side. (Value-exactness vs DuckDB is
covered by the registered oracle for lm_perplexity_scores.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.lm_quality import (
    perplexity_filter,
    perplexity_scores,
    train_bigram_lm,
)


@pytest.fixture()
def corpus(spark):
    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [
        (0, fluent, "ref"),
        (1, "the cat sat on the mat", "eval"),          # in-distribution
        (2, "zqx bvk wjm pfft qqq zzz xxy vvv", "eval"),  # pure OOV noise
        (3, "the dog sat on the mat", "eval"),          # recombined
        (4, "a", "eval"),                                # 1 token: unscoreable
        (5, None, "eval"),                               # NULL text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, split string")


def test_reference_like_docs_score_lower(spark, corpus):
    ref = corpus.filter("split = 'ref'")
    scores = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_scores(corpus, ref, "doc_id", "text").collect()
    }
    assert scores[1] < scores[2]  # fluent beats noise
    assert scores[3] < scores[2]  # recombined seen bigrams beat noise
    assert 4 not in scores and 5 not in scores  # too short to score


def test_oov_uniform_probability(spark, corpus):
    """A doc of entirely unseen tokens scores exactly ppl = V: every
    bigram gets P = 1/V, the smoothing floor."""
    import math

    ref = corpus.filter("split = 'ref'")
    _, _, vocab = train_bigram_lm(ref, "doc_id", "text")
    v = vocab.first()["v"]
    ppl2 = (
        perplexity_scores(corpus, ref, "doc_id", "text")
        .filter("doc_id = 2")
        .first()["ppl"]
    )
    assert math.isclose(ppl2, float(v), rel_tol=1e-9)


def test_min_count_pruning_never_lowers_scores(spark, corpus):
    ref = corpus.filter("split = 'ref'")
    full = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_scores(corpus, ref, "doc_id", "text").collect()
    }
    pruned = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_scores(
            corpus, ref, "doc_id", "text", min_count=2
        ).collect()
    }
    for d, p in pruned.items():
        assert p >= full[d] - 1e-9


def test_perplexity_filter_keeps_low_side(spark, corpus):
    ref = corpus.filter("split = 'ref'")
    scores = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_scores(corpus, ref, "doc_id", "text").collect()
    }
    cut = (scores[1] + scores[2]) / 2
    kept = perplexity_filter(corpus, ref, "doc_id", "text", max_ppl=cut)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 1 in ids and 3 in ids
    assert 2 not in ids           # noise filtered
    assert 4 not in ids and 5 not in ids  # unscoreable dropped
