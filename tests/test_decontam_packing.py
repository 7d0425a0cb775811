"""Semantics tests for benchmark decontamination and sequence packing —
properties the oracle-parity hash can't express (set containment,
pack-capacity invariants, sampling determinism, plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.decontam import (
    decontaminate,
    ngram_overlap,
    word_ngrams,
)
from delta_lake_optimizations_spark.operators.packing import (
    importance_sample,
    pack_sequences,
)

from .conftest import SF_DIR


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e")], "id int, text string"
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", word_ngrams(F.col("text"), 4).alias("g")).collect()
    }
    assert rows[1] == []  # 3 tokens < n=4 — not a descending-sequence blowup
    assert rows[2] == ["a b c d", "b c d e"]


def test_decontaminate_removes_exactly_the_overlapping_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)

    overlap_ids = {
        r["doc_id"] for r in ngram_overlap(train, bench, n=4).collect()
    }
    assert overlap_ids, "corpus should contain benchmark overlap at n=4"

    clean = decontaminate(train, bench, n=4)
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert clean_ids == train_ids - overlap_ids
    # idempotent: the clean corpus has no remaining overlap
    assert ngram_overlap(clean, bench, n=4).count() == 0


def test_pack_sequences_capacity_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    budget = 512
    packed = pack_sequences(
        docs, token_col="n_tokens", order_col="doc_id",
        partition_col="source", budget=budget,
    ).collect()

    by_src: dict[str, list] = {}
    for r in packed:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            # the operator's contract, replayed exactly
            assert r["pack_id"] == cum // budget, (src, r)
            assert r["pack_offset"] == cum % budget, (src, r)
            cum += r["n_tokens"]
        # pack ids are dense 0..max (no empty pack unless a doc > budget
        # straddles, which concatenate-and-split permits)
        ids = sorted({r["pack_id"] for r in rows})
        assert ids[0] == 0
        assert all(0 <= off < budget for off in (r["pack_offset"] for r in rows))


def test_pack_sequences_no_single_partition_window(spark):
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    plan = (
        pack_sequences(docs, "n_tokens", "doc_id", "source", 512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_importance_sample_deterministic_and_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = importance_sample(docs, "n_chars", "doc_id", temperature=2.0)
    b = importance_sample(docs, "n_chars", "doc_id", temperature=2.0)
    ra = {(r["doc_id"], r["keep_p"], r["u"]) for r in a.select("doc_id", "keep_p", "u").collect()}
    rb = {(r["doc_id"], r["keep_p"], r["u"]) for r in b.select("doc_id", "keep_p", "u").collect()}
    assert ra == rb  # pure function of the rows, no RNG state
    assert ra
    for _, p, u in ra:
        assert 0.0 <= u < 1.0
        assert 0.0 < p <= 1.0
    # the max-weight document is always kept (keep_p == 1 > u)
    max_chars = docs.agg(F.max("n_chars")).collect()[0][0]
    max_ids = {r["doc_id"] for r in docs.filter(F.col("n_chars") == max_chars).collect()}
    kept_ids = {t[0] for t in ra}
    assert max_ids <= kept_ids


def test_importance_sample_temperature_flattens(spark):
    """Higher temperature keeps more low-weight rows (flatter keep_p)."""
    docs = load_table(spark, SF_DIR, "documents")
    cold = importance_sample(docs, "n_chars", "doc_id", temperature=0.5).count()
    hot = importance_sample(docs, "n_chars", "doc_id", temperature=4.0).count()
    assert hot > cold
