"""BPE tokenizer: hand-computed merges on the classic toy corpus,
deterministic training, exact round-trip, encoder/memo equivalence, and
token-budget packing integration. (Corpus-level value checks are the
registered bpe_pack_documents / bpe_roundtrip_consistency oracles.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.bpe import (
    EOW,
    decode_tokens,
    encode_tokens,
    train_bpe,
    with_bpe_tokens,
    word_token_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_first_merges_on_classic_corpus(spark):
    """Sennrich's worked example shape: corpus {low x5, lowest x2,
    newer x6, wider x3}. Highest-count first pair is ('e', 'r</w>')
    from newer+wider (9); ties broken lexicographically."""
    corpus = _docs(
        spark,
        [" ".join(["low"] * 5 + ["lowest"] * 2 + ["newer"] * 6 + ["wider"] * 3)],
    )
    model = train_bpe(corpus, "text", n_merges=3)
    assert model.merges[0] == ("e", "r" + EOW)  # 9 occurrences, the max
    # determinism: training twice gives the identical merge list
    again = train_bpe(corpus, "text", n_merges=3)
    assert model.merges == again.merges


def test_encode_matches_training_segmentation(spark):
    """A word seen in training encodes to ONE token once enough merges
    exist to reassemble it; unseen words fall back to finer pieces."""
    corpus = _docs(spark, ["aaab aaab aaab"])
    model = train_bpe(corpus, "text", n_merges=10)
    assert encode_tokens("aaab", model) == ["aaab" + EOW]
    # unseen word built from seen symbols still encodes losslessly
    toks = encode_tokens("abaa", model)
    assert decode_tokens(toks) == "abaa"


def test_roundtrip_and_whitespace_normalization():
    toks_in = "the  quick\tbrown   fox"
    # decode(encode(t)) is the whitespace-NORMALIZED text by contract
    from delta_lake_optimizations_spark.operators.bpe import BpeModel

    model = BpeModel(merges=())  # char-level: every word survives as chars
    toks = encode_tokens(toks_in, model)
    assert decode_tokens(toks) == "the quick brown fox"


def test_arrow_encoder_matches_driver_encoder(spark):
    texts = ["key agg row", "scan slow fast", "table value part", "", None]
    corpus = _docs(spark, texts)
    model = train_bpe(corpus, "text", n_merges=30)
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in with_bpe_tokens(corpus, model, "text").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == encode_tokens(t or "", model), f"doc {i}"


def test_word_token_counts_cover_corpus_and_match_encoder(spark):
    corpus = _docs(spark, ["alpha beta gamma", "beta beta delta"])
    model = train_bpe(corpus, "text", n_merges=5)
    wtc = {r["word"]: r["n_tokens"] for r in word_token_counts(corpus, model, "text").collect()}
    assert set(wtc) == {"alpha", "beta", "gamma", "delta"}
    for w, n in wtc.items():
        assert n == len(encode_tokens(w, model))


def test_bpe_packing_budget_arithmetic(spark):
    """Packing on BPE counts: offsets stay inside the budget and pack
    ids are the running-sum floor — checked against a driver-side
    replay of the same arithmetic."""
    from delta_lake_optimizations_spark.operators.packing import pack_sequences

    corpus = _docs(spark, [f"w{i} " * (i + 1) for i in range(20)]).withColumn(
        "src", F.lit("s")
    )
    model = train_bpe(corpus, "text", n_merges=0)  # char-level, still valid
    toks = with_bpe_tokens(corpus, model, "text").withColumn(
        "n", F.size("bpe_tokens").cast("long")
    )
    packed = {
        r["doc_id"]: (r["n"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            toks, token_col="n", order_col="doc_id", partition_col="src", budget=64
        ).collect()
    }
    run = 0
    for i in range(20):
        n, pid, off = packed[i]
        assert pid == run // 64 and off == run % 64
        run += n
