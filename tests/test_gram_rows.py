"""r12 gram/segment enumeration rewrite (guide §2.4): the doc-local
explode(sequence) + slice/array_join forms must produce EXACTLY the rows
the old posexplode + window-``lead`` forms produced (multiset equality,
bit-identical strings, same positions), and their plans must be
shuffle-free — the whole point of the rewrite is that grams/segments
materialize in the scan stage instead of after a token-shaped exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.decontam import _word_gram_rows
from delta_lake_optimizations_spark.operators.dedup import _gram_rows, tokenize
from delta_lake_optimizations_spark.operators.paragraphs import segment_rows

# Edge-heavy corpus: normal docs, shorter-than-n, empty, NULL, repeated
# whitespace / tabs, single token, exactly-n tokens, window-multiple.
DOCS = [
    (1, "Alpha beta GAMMA delta epsilon zeta eta theta iota kappa lam mu"),
    (2, "one two"),
    (3, ""),
    (4, None),
    (5, "x y x y x y x y x y x y x"),
    (6, "tab\tsep  multi   space trailing "),
    (7, "solo"),
    (8, "a b c"),
    (9, " ".join(f"t{i}" for i in range(20))),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _old_gram_rows(df, id_col, text_col, n, short_gram=True, keep_pos=False):
    """The r7-r11 posexplode + lead window form, verbatim (the reference
    implementation the rewrite must match bit-for-bit)."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "_pos", "_t0"
        ),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    leads = toks.select(
        "_id",
        "_pos",
        F.concat_ws(
            " ", "_t0", *[F.lead("_t0", j).over(w) for j in range(1, n)]
        ).alias("_gram"),
        F.lead("_t0", n - 1).over(w).alias("_full"),
    )
    cond = F.col("_full").isNotNull()
    if short_gram:
        cond = cond | (F.col("_pos") == 0)
    pos_cols = ("_pos",) if keep_pos else ()
    return leads.filter(cond).select("_id", *pos_cols, "_gram")


def _old_word_gram_rows(df, id_col, text_col, n, keep_pos=False):
    """The old decontam posexplode + lead form, verbatim."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_t0"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    leads = toks.select(
        "_id",
        "_pos",
        F.concat_ws(
            " ", "_t0", *[F.lead("_t0", j).over(w) for j in range(1, n)]
        ).alias("gram"),
        F.lead("_t0", n - 1).over(w).alias("_full"),
    )
    pos_cols = [F.col("_pos").alias("_p")] if keep_pos else []
    return leads.filter(F.col("_full").isNotNull()).select(
        F.col("_id").alias(id_col), *pos_cols, "gram"
    )


def _old_segment_rows(df, id_col, text_col, window=10):
    """The old paragraphs posexplode + lead window-token form, verbatim."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokenize(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "_pos", "_t0"
        ),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    leads = toks.select(
        "_id",
        "_pos",
        F.concat_ws(
            " ", "_t0", *[F.lead("_t0", j).over(w) for j in range(1, window)]
        ).alias("_seg"),
    )
    return leads.filter(F.col("_pos") % window == 0).select(
        "_id",
        (F.col("_pos") / window).cast("int").alias("_pos"),
        "_seg",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("n", [2, 3, 8])
@pytest.mark.parametrize("short_gram", [True, False])
def test_gram_rows_match_lead_window_form(docs, n, short_gram):
    new = _gram_rows(docs, "doc_id", "text", n, short_gram=short_gram, keep_pos=True)
    old = _old_gram_rows(docs, "doc_id", "text", n, short_gram=short_gram, keep_pos=True)
    assert _rows(new) == _rows(old)


@pytest.mark.parametrize("n", [3, 8])
def test_word_gram_rows_match_lead_window_form(docs, n):
    new = _word_gram_rows(docs, "doc_id", "text", n, keep_pos=True)
    old = _old_word_gram_rows(docs, "doc_id", "text", n, keep_pos=True)
    assert _rows(new) == _rows(old)
    # NULL text must DROP the doc (posexplode-of-NULL semantics)
    assert not [r for r in new.collect() if r["doc_id"] == 4]


@pytest.mark.parametrize("window", [4, 10])
def test_segment_rows_match_lead_window_form(docs, window):
    new = segment_rows(docs, "doc_id", "text", window=window)
    old = _old_segment_rows(docs, "doc_id", "text", window=window)
    assert _rows(new) == _rows(old)


def test_gram_and_segment_plans_are_shuffle_free(docs):
    """The rewrite's reason to exist: zero Exchange below the gram rows —
    every downstream per-doc/per-gram aggregate starts map-side."""
    for frame in (
        _gram_rows(docs, "doc_id", "text", 3),
        _word_gram_rows(docs, "doc_id", "text", 3),
        segment_rows(docs, "doc_id", "text", window=10),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Window" not in plan, plan
