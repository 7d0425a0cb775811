"""BPE tokenizer: hand-computed merges on the classic toy corpus,
deterministic training, exact round-trip, encoder/memo equivalence, and
token-budget packing integration. (Corpus-level value checks are the
registered bpe_pack_documents / bpe_roundtrip_consistency oracles.)"""

from __future__ import annotations

import pytest

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


# --- property-based invariants (hypothesis) ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORD = st.text(
    alphabet=st.characters(
        blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs"),
        # keep the EOW marker unforgeable;  is the chunking
        # continuation marker (outside the tokenizer's input domain)
        blacklist_characters="<>/",
    ),
    min_size=1,
    max_size=8,
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@pytest.mark.slow  # property sweep; operator covered by the fast bpe tests
@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=st.lists(_TEXT, min_size=1, max_size=6), n_merges=st.integers(0, 30))
def test_bpe_roundtrip_property(spark, corpus, n_merges):
    """For ANY corpus and merge budget: decode(encode(t)) reproduces the
    whitespace-normalized text, encoding is deterministic, and every
    word's token count is between 1 and its character length."""
    from delta_lake_optimizations_spark.operators.bpe import (
        decode_tokens,
        encode_tokens,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    from delta_lake_optimizations_spark.operators.textnorm import INVISIBLES

    def norm(s: str) -> str:
        # the tokenizer's contract: invisibles stripped (the shared
        # light-normalization tier), whitespace collapsed
        for ch in INVISIBLES:
            s = s.replace(ch, "")
        return " ".join(s.split())

    model = train_bpe(df, "text", n_merges=n_merges)
    assert model.merges == train_bpe(df, "text", n_merges=n_merges).merges
    for t in corpus:
        toks = encode_tokens(t, model)
        assert decode_tokens(toks) == norm(t)
        assert toks == encode_tokens(t, model)
        for w in norm(t).split():
            # byte-level symbols: the count bound is UTF-8 bytes, not chars
            n = len(encode_tokens(w, model))
            assert 1 <= n <= len(w.encode("utf-8"))


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ref_texts=st.lists(_TEXT, min_size=1, max_size=4),
    doc_texts=st.lists(_TEXT, min_size=1, max_size=4),
)
@pytest.mark.slow  # property sweep; operator covered by the fast bpe tests
def test_backoff_scores_bounded_property(spark, ref_texts, doc_texts):
    """Stupid-backoff scores are bounded: every level's S is <= 1
    (trigram ratio <= 1; 0.4 * bigram ratio <= 0.4; the smoothed unigram
    <= 0.16), so per-document ppl = exp(avg -ln S) >= 1 for ANY
    reference/document pair — and every doc with >= 3 tokens gets a row."""
    from delta_lake_optimizations_spark.operators.lm_quality import backoff_scores

    rows = [(i, t, "ref") for i, t in enumerate(ref_texts)] + [
        (100 + i, t, "eval") for i, t in enumerate(doc_texts)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = {
        r["doc_id"]: r["ppl"]
        for r in backoff_scores(
            corpus, corpus.filter("split = 'ref'"), "doc_id", "text"
        ).collect()
    }
    for i, t in enumerate(doc_texts):
        n_toks = len(t.split())
        if n_toks >= 3:
            assert 100 + i in got
            assert got[100 + i] >= 1.0 - 1e-9
        else:
            assert 100 + i not in got


def test_pack_sizes_are_exactly_budget_except_shard_tails(spark):
    """Concatenate-and-split's defining property, on the real corpus:
    every (source, pack) holds exactly 256 BPE tokens except each
    shard's final pack, and straddled documents are counted in every
    pack they touch (so per-pack doc counts sum to >= the doc count)."""
    from delta_lake_optimizations_spark.operators.bpe import bpe_pack_sizes

    from .conftest import SF_DIR

    rows = bpe_pack_sizes(spark, SF_DIR).collect()
    assert rows
    last = {}
    for r in rows:
        last[r["source"]] = max(last.get(r["source"], -1), r["pack_id"])
    for r in rows:
        if r["pack_id"] != last[r["source"]]:
            assert r["n_tokens"] == 256, (r["source"], r["pack_id"], r["n_tokens"])
        else:
            assert 0 < r["n_tokens"] <= 256
        assert r["n_docs"] >= 1


def test_mixed_script_roundtrip_and_cjk_tokens(spark):
    """Byte-level BPE (VERDICT r08 #3): whitespace-free scripts must
    round-trip exactly and actually tokenize (multi-byte chars reassemble
    through merges) instead of degenerating to whole-sentence words."""
    from delta_lake_optimizations_spark.operators.bpe import (
        decode_tokens,
        encode_tokens,
        train_bpe,
    )

    corpus = [
        "hello world hello",
        "深度学习模型训练数据深度学习",  # CJK, no whitespace
        "สวัสดีชาวโลกสวัสดี",  # Thai, no whitespace
        "mixed 深度 text ข้อความ done",
        "émigré naïve café",  # Latin with diacritics (2-byte chars)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    model = train_bpe(df, "text", n_merges=80)
    for t in corpus:
        toks = encode_tokens(t, model)
        assert decode_tokens(toks) == " ".join(t.split()), t
    # with enough merges the frequent CJK chars (3 UTF-8 bytes each)
    # merge back into <= 1 token per char: the 12-char repeated phrase
    # must encode to at most ~1 token per char, not 36 byte tokens
    cjk = "深度学习模型训练数据深度学习"
    assert len(encode_tokens(cjk, model)) <= len(cjk) + 2


def test_no_whitespace_input_keeps_dictionary_bounded(spark):
    """The 16-char chunking cap: a whitespace-free corpus (one giant
    'word' per doc under the old pre-tokenizer) must produce a word
    dictionary bounded by total_chars/16 + docs, with every entry's
    symbol sequence bounded by 16 chars of UTF-8 bytes."""
    from delta_lake_optimizations_spark.operators.bpe import (
        MAX_WORD_CHARS,
        _word_symbols,
        word_counts,
    )

    docs = [
        (i, "和平与发展合作共赢的时代潮流不可阻挡" * 25)  # 450 chars, 0 spaces
        for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    words = [r["word"] for r in word_counts(df, "text").collect()]
    n_chars = 450
    assert len(words) <= n_chars // MAX_WORD_CHARS + 2
    for w in words:
        assert len(_word_symbols(w)) <= MAX_WORD_CHARS * 4
    # and the continuation tagging is consistent: exactly one final chunk
    finals = [w for w in words if not w.endswith("")]
    assert len(finals) >= 1
