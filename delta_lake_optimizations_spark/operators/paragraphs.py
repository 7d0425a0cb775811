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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.dedup import tokenize
from delta_lake_optimizations_spark.registry import query


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
    segments dropped (blank lines are separators, not content).
    ``sep`` None: fixed ``window``-token segments over the shared
    ``tokenize`` convention; the tail segment may be shorter. Built
    with posexplode + lead (codegen) — see module docstring.
    """
    if sep is not None:
        raw = df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
            ).alias("_pos", "_raw"),
        )
        return raw.select("_id", "_pos", F.trim("_raw").alias("_seg")).filter(
            F.col("_seg") != ""
        )
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


def _reassemble(kept: DataFrame, join_sep: str) -> DataFrame:
    """Per-doc ordered re-join of kept segments: ``(_id, n_kept, _text)``.
    collect_list is not order-stable — sort the (pos, seg) structs."""
    return kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.array_sort(F.collect_list(F.struct("_pos", "_seg")))["_seg"],
            join_sep,
        ).alias("_text"),
    )


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
    dedup; docs stripped to nothing keep ``dedup_text = ''``."""
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    w = Window.partitionBy("_seg").orderBy("_id", "_pos")
    ranked = segs.withColumn("_rn", F.row_number().over(w))
    join_sep = " " if sep is None else (sep if len(sep) == 1 else "\n")
    return (
        ranked.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_rn") == 1, F.struct("_pos", "_seg"))
                    )
                )["_seg"],
                join_sep,
            ).alias("dedup_text"),
        )
        .select(
            F.col("_id").alias(id_col), "n_segments", "n_kept", "dedup_text"
        )
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
    clean_text)``. Anti-join against the aggregated boilerplate set —
    skew-immune (the hot segment collapses map-side in the aggregate)
    and AQE broadcasts the set when it is small."""
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    boiler = (
        segs.groupBy("_seg")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_seg")
    )
    kept = segs.join(boiler, "_seg", "left_anti")
    join_sep = " " if sep is None else (sep if len(sep) == 1 else "\n")
    totals = segs.groupBy("_id").agg(F.count(F.lit(1)).alias("n_segments"))
    rebuilt = _reassemble(kept, join_sep)
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_segments",
            (F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("_text"), F.lit("")).alias("clean_text"),
        )
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
