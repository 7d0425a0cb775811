"""Unicode normalization choke point (operators/textnorm.py): mixed-form
duplicates collapse only under normalization; the light tier stays in
codegen and feeds the shared tokenizers; the full-tier plan is map-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.textnorm import (
    light_normalize,
    normalize_text_col,
    strip_invisible,
)

COMPOSED = "Café"                    # é composed
DECOMPOSED = "Café"                 # e + COMBINING ACUTE
ZW = "Ca​fé﻿"              # zero-width space + BOM noise


def test_mixed_forms_dodge_raw_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, COMPOSED), (2, DECOMPOSED), (3, ZW)], "id long, text string"
    )
    raw = df.select(F.sha2(F.col("text"), 256).alias("fp")).distinct().count()
    assert raw == 3  # three byte-distinct forms of one visual text


def test_full_normalization_collapses_all_forms(spark):
    df = spark.createDataFrame(
        [(1, COMPOSED), (2, DECOMPOSED), (3, ZW), (4, "CAFÉ")],
        "id long, text string",
    )
    normed = df.select(normalize_text_col(F.col("text")).alias("n"))
    vals = {r["n"] for r in normed.collect()}
    assert vals == {"café"}


def test_light_tier_strips_invisibles_in_codegen(spark):
    df = spark.createDataFrame([(1, ZW)], "id long, text string")
    out = df.select(light_normalize(F.col("text")).alias("n")).first()["n"]
    assert out == "café"
    # pure codegen: no Python evaluation node in the plan
    plan = df.select(strip_invisible(F.col("text"))).\
        _jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_tokenizers_ride_the_light_tier(spark):
    from delta_lake_optimizations_spark.operators.bpe import pre_tokenize
    from delta_lake_optimizations_spark.operators.dedup import tokenize

    df = spark.createDataFrame(
        [(1, "Hello​ World﻿ x")], "id long, text string"
    )
    toks = df.select(tokenize(F.col("text")).alias("t")).first()["t"]
    assert toks == ["hello", "world", "x"]
    pre = df.select(pre_tokenize(F.col("text")).alias("t")).first()["t"]
    assert pre == ["Hello", "World", "x"]  # case preserved, ZW stripped


def test_full_tier_plan_is_map_only(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("Text "), F.col("id")).alias("text")
    )
    plan = df.select(normalize_text_col(F.col("text"))).\
        _jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one Arrow stage, zero shuffles


def test_dedup_normalized_forms_survivors(spark):
    """Three re-keyed visually-identical variants per doc collapse to the
    min-id original (the registered query's contract, locally on a tiny
    frame so the invariant is obvious)."""
    from delta_lake_optimizations_spark.operators.textnorm import (
        dedup_normalized_forms,
    )
    from .conftest import SF_DIR

    survivors = {r["doc_id"] for r in dedup_normalized_forms(spark, SF_DIR).collect()}
    from delta_lake_optimizations_spark.catalog import load_table

    base_ids = {
        r["doc_id"] for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()
    }
    assert survivors == base_ids  # originals win; +1M/+2M variants all drop


def test_normalize_is_idempotent_property(spark):
    """normalize(normalize(x)) == normalize(x) for adversarial inputs —
    NFC is idempotent, the strip removes everything it targets in one
    pass, and lower of lower is lower."""
    probes = [
        COMPOSED, DECOMPOSED, ZW, "CAFÉ", "ẛ̣ mixed ʼn",  # exotic composições
        "ＦＵＬＬＷＩＤＴＨ", "ñ Ñ ǅungla ǋ", "", " ", "a​‌‍b",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(probes)], "id long, text string"
    )
    once = df.select("id", normalize_text_col(F.col("text")).alias("n"))
    twice = once.select("id", normalize_text_col(F.col("n")).alias("n2"))
    joined = once.join(twice, "id")
    assert joined.filter(F.col("n") != F.col("n2")).count() == 0
