"""Paragraph-level dedup / boilerplate stripping: structural (line)
segmentation, first-seen-wins order, full-doc erasure, window-tail
segments, and strip-vs-dedup divergence on the canonical copy.
(Value-exactness vs DuckDB is covered by the three registered oracles.)"""

from __future__ import annotations

import pytest

from delta_lake_optimizations_spark.operators.paragraphs import (
    boilerplate_segments,
    dedup_paragraphs,
    segment_rows,
    strip_boilerplate,
)


@pytest.fixture()
def lined(spark):
    rows = [
        (0, "subscribe now\nthe quick brown fox\nsubscribe now"),
        (1, "subscribe now\njumps over the dog"),
        (2, "subscribe now"),          # nothing but boilerplate
        (3, "  \n\nunique line\n"),    # blank segments are separators
        (4, None),                     # NULL text: zero segments
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_structural_segmentation_drops_blanks(spark, lined):
    segs = segment_rows(lined, "doc_id", "text", sep="\n").collect()
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r["_id"], []).append((r["_pos"], r["_seg"]))
    assert sorted(by_doc[3]) == [(2, "unique line")]  # blanks dropped, pos kept
    assert 4 not in by_doc  # NULL text -> '' -> no segments
    assert len(by_doc[0]) == 3  # intra-doc repeat is two occurrences


def test_dedup_first_seen_wins_across_and_within_docs(spark, lined):
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(lined, "doc_id", "text", sep="\n").collect()
    }
    # doc 0 owns the canonical "subscribe now" (lowest doc_id, pos 0);
    # its own pos-2 repeat and every other doc's copy are dropped
    assert out[0]["dedup_text"] == "subscribe now\nthe quick brown fox"
    assert (out[0]["n_segments"], out[0]["n_kept"]) == (3, 2)
    assert out[1]["dedup_text"] == "jumps over the dog"
    # doc 2 loses everything but still surfaces, with empty text
    assert (out[2]["n_kept"], out[2]["dedup_text"]) == (0, "")
    assert 4 not in out  # zero-segment docs have nothing to reassemble


def test_strip_removes_all_copies_including_canonical(spark, lined):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            lined, "doc_id", "text", min_docs=2, sep="\n"
        ).collect()
    }
    # unlike dedup, the canonical copy in doc 0 is removed too
    assert out[0]["clean_text"] == "the quick brown fox"
    assert out[0]["n_removed"] == 2
    assert out[2]["clean_text"] == ""
    assert out[3]["clean_text"] == "unique line"


def test_boilerplate_profile_counts_docs_not_occurrences(spark, lined):
    rows = boilerplate_segments(
        lined, "doc_id", "text", min_docs=3, sep="\n"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # 4 occurrences (doc 0 twice) but 3 distinct docs
    assert (r["segment"], r["n_docs"], r["n_occurrences"]) == (
        "subscribe now", 3, 4,
    )


def test_token_window_tail_segment(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j k l m")], "doc_id long, text string"
    )
    segs = sorted(
        (r["_pos"], r["_seg"])
        for r in segment_rows(df, "doc_id", "text", window=10).collect()
    )
    assert segs == [(0, "a b c d e f g h i j"), (1, "k l m")]
