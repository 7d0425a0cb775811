"""Paragraph-level corpus dedup + boilerplate removal (CCNet stage 1,
Wenzek et al. 2020; Common-Crawl boilerplate line stripping a la
RefinedWeb/Gopher): documents are split into SEGMENTS, segments are
deduplicated (or frequency-profiled) ACROSS the whole corpus, and the
surviving segments are reassembled into documents in original order.
This is finer-grained than doc-level dedup (`operators/dedup.py`): it
removes the repeated header/footer/quoted-reply material that doc-level
MinHash only dilutes.

Segmentation is structural when the corpus has structure (``sep="\\n"``
for line/paragraph dedup) and falls back to fixed token windows when it
does not (the synthetic corpus is single-line, so the registered
queries use ``window=10`` token segments — same operator, same plan).

Semantics (mirrored exactly in the DuckDB oracles):

- first-seen-wins: a segment's canonical occurrence is the minimum
  ``(doc_id, position)`` over every occurrence corpus-wide; later
  occurrences are dropped (CCNet keeps one copy of each paragraph);
- boilerplate: a segment occurring in >= ``min_docs`` DISTINCT
  documents is boilerplate; ``strip_boilerplate`` removes ALL its
  occurrences (no canonical copy survives — headers are noise, not
  content);
- reassembly: kept segments re-join in original segment order;
  documents whose every segment was removed surface with empty text,
  not dropped (the caller's length gates decide their fate).

100 TB design: segmentation is a doc-local window (posexplode + lead,
whole-stage codegen — the ``transform``/``slice`` HOF form evaluates
interpreted, see `_gram_rows`), so it clusters by doc and never
shuffles segment text twice. First-seen-wins is ONE shuffle on the
segment key; reassembly is ONE shuffle back on doc id. The boilerplate
profile is a hash aggregate with map-side combine. Skew note: a
mega-hot segment (an empty line in a billion docs) skews the
row_number window — the strip path's groupBy-then-anti-join
formulation is skew-immune (partial aggregation absorbs the hot key
map-side), which is why stripping does NOT reuse the ranked frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.dedup import tokenize
from delta_lake_optimizations_spark.registry import query


def _segments_array(text_col_expr, sep: str | None, window: int):
    """Per-doc segment ARRAY, position-indexed — the doc-local twin of
    ``segment_rows`` (r11): ``element_at(_segs, pos + 1)`` is segment
    ``pos``. For the ``sep`` path the array keeps empty (dropped)
    segments so positions still line up; callers must skip ``''``."""
    if sep is not None:
        return F.transform(
            F.split(F.coalesce(text_col_expr, F.lit("")), sep),
            lambda s: F.trim(s),
        )
    toks = tokenize(F.coalesce(text_col_expr, F.lit("")))
    n = F.ceil(F.size(toks) / F.lit(float(window))).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * window + 1, window)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _n_segments(segs_arr, sep: str | None):
    """Pre-dedup segment count per doc (``sep`` path: non-empty only)."""
    if sep is not None:
        return F.size(F.filter(segs_arr, lambda s: s != F.lit("")))
    return F.size(segs_arr)


def segment_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str | None = None,
    window: int = 10,
) -> DataFrame:
    """``(_id, _pos, _seg)`` — one row per segment, ``_pos`` is the
    segment's ordinal within its document.

    ``sep`` given: structural split (regex), segments trimmed, empty
    segments dropped (blank lines are separators, not content) — their
    positions remain occupied so ``_pos`` is stable.
    ``sep`` None: fixed ``window``-token segments over the shared
    ``tokenize`` convention; the tail segment may be shorter.

    r11: the window path was posexplode + ``lead`` — whole-stage
    codegen, but the window function forced an exchange + sort of EVERY
    TOKEN by doc id before a single segment existed (guide §2.4). The
    ``transform``/``slice`` form is doc-local and map-only; it evaluates
    interpreted (CodegenFallback), but at one slice per ``window``
    tokens that costs far less than shuffling the tokenized corpus
    (measured in OPTIMIZATION_r11.md). Identical segments: concat_ws
    skips the NULL leads exactly as it joins the short tail slice."""
    segs_arr = _segments_array(F.col(text_col), sep, window)
    rows = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(segs_arr).alias("_pos", "_seg"),
    )
    if sep is not None:
        rows = rows.filter(F.col("_seg") != "")
    return rows


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str | None = None,
    window: int = 10,
) -> DataFrame:
    """Corpus-wide first-seen-wins segment dedup, reassembled:
    ``(id_col, n_segments, n_kept, dedup_text)`` for every document
    with >= 1 segment. ``n_segments`` counts the doc's segments before
    dedup; docs stripped to nothing keep ``dedup_text = ''``.

    r11 rewrite (guide §2.3/§2.5, plans in plans/r11): was a
    row_number window over the segment key (skew-prone on a mega-hot
    segment — the module docstring's own warning) followed by a
    groupBy(doc) whose collect_list shuffled every surviving segment's
    TEXT a second time. First-seen-wins is just ``min(struct(id, pos))``
    per segment — a hash aggregate with map-side partial combine
    (skew-immune), after which the winning positions aggregate to ONE
    compact row per doc and reassembly is a doc-local position lookup
    into the segment array. Segment text now crosses exactly one
    exchange (inside the min-aggregate); nothing token- or text-shaped
    is shuffled for reassembly. Output identical: the rn=1 row of
    (ORDER BY id, pos) IS the min struct."""
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    join_sep = " " if sep is None else (sep if len(sep) == 1 else "\n")
    kept = (
        segs.groupBy("_seg")
        .agg(F.min(F.struct("_id", "_pos")).alias("_f"))
        .select(F.col("_f._id").alias("_id"), F.col("_f._pos").alias("_pos"))
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_keep"))
    )
    segs_arr = _segments_array(F.col(text_col), sep, window)
    base = df.select(
        F.col(id_col).alias("_id"),
        segs_arr.alias("_segs"),
        _n_segments(segs_arr, sep).cast("long").alias("n_segments"),
    ).filter(F.col("n_segments") > 0)
    return base.join(kept, "_id", "left").select(
        F.col("_id").alias(id_col),
        "n_segments",
        F.coalesce(F.size("_keep"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.col("_keep"), lambda p: F.element_at(F.col("_segs"), p + 1)
                ),
                join_sep,
            ),
            F.lit(""),
        ).alias("dedup_text"),
    )


def boilerplate_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str | None = None,
    window: int = 10,
) -> DataFrame:
    """Segments occurring in >= ``min_docs`` distinct documents:
    ``(segment, n_docs, n_occurrences)`` — the corpus's boilerplate
    profile. One hash aggregate; countDistinct expands to the standard
    two-phase distinct aggregate (still map-side partial)."""
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    return (
        segs.groupBy(F.col("_seg").alias("segment"))
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    sep: str | None = None,
    window: int = 10,
) -> DataFrame:
    """Remove EVERY occurrence of boilerplate segments (>= ``min_docs``
    distinct docs), reassemble: ``(id_col, n_segments, n_removed,
    clean_text)``. The boilerplate set comes from a hash aggregate —
    skew-immune (the hot segment collapses map-side).

    r11 rewrite (guide §2.3): was a per-segment anti-join followed by a
    collect_list reassembly that shuffled every surviving segment's text
    by doc id. Now only the DROPPED positions travel — the semi-join
    against the (small, AQE-broadcastable) boilerplate set marks
    occurrences, those positions aggregate to one compact row per doc,
    and reassembly is a doc-local indexed filter over the segment array.
    n_removed = count of dropped occurrences, exactly the old
    ``n_segments - n_kept``."""
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    boiler = (
        segs.groupBy("_seg")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_seg")
    )
    dropped = (
        segs.join(boiler, "_seg", "left_semi")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_drop"))
    )
    join_sep = " " if sep is None else (sep if len(sep) == 1 else "\n")
    segs_arr = _segments_array(F.col(text_col), sep, window)
    base = df.select(
        F.col(id_col).alias("_id"),
        segs_arr.alias("_segs"),
        _n_segments(segs_arr, sep).cast("long").alias("n_segments"),
    ).filter(F.col("n_segments") > 0)
    drop_arr = F.coalesce(F.col("_drop"), F.array().cast("array<int>"))
    keep_pred = (
        (lambda s, i: ~F.array_contains(drop_arr, i) & (s != F.lit("")))
        if sep is not None
        else (lambda s, i: ~F.array_contains(drop_arr, i))
    )
    return base.join(dropped, "_id", "left").select(
        F.col("_id").alias(id_col),
        "n_segments",
        F.coalesce(F.size("_drop"), F.lit(0)).cast("long").alias("n_removed"),
        F.array_join(F.filter(F.col("_segs"), keep_pred), join_sep).alias(
            "clean_text"
        ),
    )


_SEGS_SQL = """
        toks AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+') AS t
            FROM documents
        ),
        segs AS (
            SELECT doc_id, i.i AS pos,
                   array_to_string(list_slice(t, i.i * 10 + 1, i.i * 10 + 10), ' ') AS seg
            FROM toks,
                 LATERAL (SELECT UNNEST(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS i) i
        )
"""


@query(
    "paragraph_dedup_docs",
    tags=("dedup", "text", "pipeline"),
    oracle=f"""
        WITH {_SEGS_SQL},
        ranked AS (
            SELECT doc_id, pos, seg,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
            FROM segs
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), '')
                   AS dedup_text
        FROM ranked
        GROUP BY doc_id
    """,
)
def paragraph_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet stage-1 paragraph dedup over 10-token segments: corpus-wide
    first-seen-wins, documents reassembled — fully value-checked
    including the reassembled text."""
    documents = load_table(spark, sf_dir, "documents")
    return dedup_paragraphs(documents, "doc_id", "text", window=10)


@query(
    "boilerplate_segments_profile",
    tags=("dedup", "text"),
    oracle=f"""
        WITH {_SEGS_SQL}
        SELECT seg AS segment,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM segs
        GROUP BY seg
        HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def boilerplate_segments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segments shared by >= 2 distinct documents — the boilerplate
    candidates paragraph-stripping would remove."""
    documents = load_table(spark, sf_dir, "documents")
    return boilerplate_segments(documents, "doc_id", "text", min_docs=2, window=10)


@query(
    "strip_boilerplate_docs",
    tags=("dedup", "text", "pipeline"),
    oracle=f"""
        WITH {_SEGS_SQL},
        boiler AS (
            SELECT seg FROM segs GROUP BY seg
            HAVING COUNT(DISTINCT doc_id) >= 2
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(CASE WHEN b.seg IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_removed,
               COALESCE(string_agg(CASE WHEN b.seg IS NULL THEN s.seg END,
                                   ' ' ORDER BY s.pos), '') AS clean_text
        FROM segs s LEFT JOIN boiler b USING (seg)
        GROUP BY s.doc_id
    """,
)
def strip_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate stripping: every occurrence of any segment shared by
    >= 2 documents removed, documents reassembled."""
    documents = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(documents, "doc_id", "text", min_docs=2, window=10)
