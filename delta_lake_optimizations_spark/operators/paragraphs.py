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
    DOC-LOCALLY (r12): tokenize once per doc, explode the segment
    ordinals, ``slice``/``array_join`` each segment out of the carried
    token array — zero shuffles (the prior posexplode + ``lead`` window
    shuffled and sorted every token by ``_id`` first; slice/array_join
    are plain expressions, not lambda HOFs, so nothing re-evaluates per
    element — the r11 transform/slice trap does not apply). Segment
    strings are byte-identical: a full window is exactly ``window``
    tokens space-joined; the tail ``slice`` caps at the array end the
    same way concat_ws skipped the NULL leads.
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
    from delta_lake_optimizations_spark.operators.dedup import spread_doc_rows

    toks_df = spread_doc_rows(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id"
    ).select(
        "_id",
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    )
    # tokenize never returns an empty array (split of '' is ['']), so every
    # doc has >= 1 segment and the ordinal sequence 0..ceil(sz/window)-1 is
    # always non-empty — no empty-branch guard needed.
    nseg = F.ceil(F.size("_toks") / F.lit(window)).cast("int")
    rows = toks_df.select(
        "_id", "_toks", F.explode(F.sequence(F.lit(0), nseg - 1)).alias("_pos")
    )
    return rows.select(
        "_id",
        "_pos",
        F.array_join(
            F.slice("_toks", F.col("_pos") * window + 1, window), " "
        ).alias("_seg"),
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


def _rebuild_from_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    per_doc: DataFrame,
    window: int,
    out_cols: tuple[str, str, str],
    positions_are_kept: bool,
) -> DataFrame:
    """Shared Arrow rebuild tail for the token-window paragraph paths
    (the shape that won for span removal, OPTIMIZATION_r11.md change 3):
    ``per_doc`` is ``(_id, _ps)`` — the doc's KEPT (dedup) or REMOVED
    (strip) segment ordinals, sorted — produced by a slim positions-only
    shuffle. One ``mapInPandas`` pass re-derives each doc's segments from
    its token array (tokenized in the JVM, so Java-regex semantics are
    preserved; the array crosses Arrow once, map-side) and emits
    ``(id, n_segments, <n_kept|n_removed>, <text>)``. Docs absent from
    ``per_doc`` get an empty position list."""
    from delta_lake_optimizations_spark.operators.dedup import spread_doc_rows

    id_type = dict(df.dtypes)[id_col]
    n_col, cnt_col, text_out = out_cols
    joined = spread_doc_rows(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_id"
    ).select(
        "_id",
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).join(per_doc, "_id", "left")

    def rebuild(batches):
        import pandas as pd

        for pdf in batches:
            ids, nsegs, cnts, texts = [], [], [], []
            for i, toks, ps in zip(pdf["_id"], pdf["_toks"], pdf["_ps"]):
                tl = list(toks)
                nseg = (len(tl) + window - 1) // window
                marked = set() if ps is None else set(int(p) for p in ps)
                if positions_are_kept:
                    chosen = sorted(marked)
                    cnt = len(chosen)
                else:
                    chosen = [p for p in range(nseg) if p not in marked]
                    cnt = nseg - len(chosen)
                ids.append(i)
                nsegs.append(nseg)
                cnts.append(cnt)
                texts.append(
                    " ".join(
                        " ".join(tl[p * window : (p + 1) * window])
                        for p in chosen
                    )
                )
            yield pd.DataFrame(
                {"_id": ids, n_col: nsegs, cnt_col: cnts, text_out: texts}
            )

    return joined.mapInPandas(
        rebuild,
        schema=(
            f"_id {id_type}, {n_col} bigint, {cnt_col} bigint, "
            f"{text_out} string"
        ),
    ).withColumnRenamed("_id", id_col)


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

    Token-window path (r12, VERDICT r11 #4 — the shape that won for span
    removal): segment rows are doc-local (``segment_rows``), the
    first-seen decision is a ``min(struct(id, pos))`` HASH aggregate on
    the segment key (skew-immune map-side partial combine; identical to
    the old ``row_number() == 1`` since the window ordered by exactly
    ``(_id, _pos)``), winners collapse to a slim per-doc KEPT-ordinal
    list (bytes, not text), and one Arrow pass rebuilds each document
    from its own token array. Segment text crosses exactly ONE exchange
    (the decision aggregate, pre-combined map-side) instead of two
    full-text shuffles (rank window + reassembly groupBy)."""
    if sep is None:
        segs = segment_rows(df, id_col, text_col, sep=None, window=window)
        winners = segs.groupBy("_seg").agg(
            F.min(F.struct("_id", "_pos")).alias("_w")
        )
        per_doc = (
            winners.select(F.col("_w._id").alias("_id"), F.col("_w._pos").alias("_p"))
            .groupBy("_id")
            .agg(F.sort_array(F.collect_list("_p")).alias("_ps"))
        )
        return _rebuild_from_positions(
            df, id_col, text_col, per_doc, window,
            ("n_segments", "n_kept", "dedup_text"), positions_are_kept=True,
        )
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    w = Window.partitionBy("_seg").orderBy("_id", "_pos")
    ranked = segs.withColumn("_rn", F.row_number().over(w))
    join_sep = sep if len(sep) == 1 else "\n"
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
    clean_text)``. The boilerplate set is an aggregate — skew-immune (the
    hot segment collapses map-side) — and AQE broadcasts it when small.

    Token-window path (r12, same shape as ``dedup_paragraphs``): the
    per-occurrence decision is a semi-join of segment rows against the
    boilerplate set yielding slim REMOVED ordinals ``(_id, _pos)``; one
    Arrow pass rebuilds each doc from its token array. The old tail
    (anti-join -> per-doc totals aggregate -> collect_list reassembly)
    shuffled full segment text a second time; nothing text-shaped
    shuffles here beyond the decision aggregate itself."""
    segs = segment_rows(df, id_col, text_col, sep=sep, window=window)
    if sep is None:
        # doc-local segment rows have no exchange to reuse, and segs has
        # TWO consumers (the boilerplate aggregate and the per-occurrence
        # semi-join) — repartition once on the segment key so both reuse
        # one exchange: the aggregate inherits the partitioning, the
        # semi-join is co-partitioned
        segs = segs.repartition(F.col("_seg"))
    boiler = (
        segs.groupBy("_seg")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_seg")
    )
    if sep is None:
        per_doc = (
            segs.join(boiler, "_seg", "left_semi")
            .groupBy("_id")
            .agg(F.sort_array(F.collect_list("_pos")).alias("_ps"))
        )
        return _rebuild_from_positions(
            df, id_col, text_col, per_doc, window,
            ("n_segments", "n_removed", "clean_text"),
            positions_are_kept=False,
        )
    kept = segs.join(boiler, "_seg", "left_anti")
    join_sep = sep if len(sep) == 1 else "\n"
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
