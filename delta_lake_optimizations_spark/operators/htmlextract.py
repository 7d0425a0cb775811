"""HTML -> text extraction (SURVEY §2.9 north-star extension).

Every web-scale training corpus starts from crawled HTML; the first
pipeline stage is boilerplate-free TEXT extraction (C4 strips tags and
keeps visible text; RefinedWeb/CCNet run trafilatura-class extractors —
see PAPERS.md). The reference corpus ships no raw HTML, but a 100 TB
pipeline user needs the stage, so this module provides the extraction
choke point as PURE Spark expressions:

- ``html_to_text``: drop ``<script>``/``<style>`` blocks and comments
  (their content is never visible text), convert block-level tag
  boundaries (``p/div/br/h1-6/li/ul/ol/tr/table/blockquote``) to
  newlines so paragraph structure survives for the paragraph-dedup
  stage (`operators/paragraphs.py`), strip the remaining tags, decode
  the six ubiquitous named entities (``&lt; &gt; &quot; &#39; &nbsp;``
  then ``&amp;`` LAST so double-escaped text decodes one level, the
  HTML spec's serialization order), and collapse whitespace.

Scale: the whole extraction is a row-local ``regexp_replace`` /
``replace`` chain — whole-stage codegen, ZERO shuffles, zero UDFs
(plan-guarded in tests/test_htmlextract.py). At 100 TB this stage is
embarrassingly parallel and bounded by parquet scan throughput; keeping
it out of Python matters more here than anywhere because it touches
every byte of the raw corpus exactly once.

Regex dialect note: every pattern below restricts itself to the
intersection of Java regex (Spark) and RE2 (DuckDB) — inline ``(?i)``,
``\\b``, non-greedy ``.*?``, character classes — and the synthetic
corpus is single-line so no DOTALL flag is needed; the DuckDB oracle
passes ``'g'`` explicitly (Spark's regexp_replace is always global).

The driver corpus has no HTML column, so the registered query wraps
``documents.text`` in a deterministic messy page — script with ``<``
comparisons, style block, comment, heading with entities, conditional
list markup, double-escaped entity — built by the IDENTICAL string
expression in the oracle SQL, so extraction semantics are value-checked
against DuckDB end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query

#: tags whose boundaries are paragraph/line breaks in visible text
_BLOCK_TAGS = "p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote"

#: named entities decoded by the extractor, in decode order
#: (&amp; must come last: "&amp;lt;" means the TEXT "&lt;", i.e. one
#: decode level per pass — decoding it first would re-decode)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML fragment, paragraphs joined by ``\\n``."""
    x = F.regexp_replace(html, r"(?i)<script\b[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?i)<style\b[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?i)</?(" + _BLOCK_TAGS + r")\b[^>]*>", "\n")
    x = F.regexp_replace(x, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r"\s*\n\s*", "\n")
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def extract_documents(
    df: DataFrame, html_col: str, id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """``(id_cols..., clean_text, n_lines, n_chars_clean)`` — the
    extracted corpus ready for the normalization/dedup stages."""
    clean = html_to_text(F.col(html_col))
    return df.select(
        *[F.col(c) for c in id_cols],
        clean.alias("clean_text"),
        F.when(clean == "", F.lit(0))
        .otherwise(F.size(F.split(clean, "\n")))
        .cast("int")
        .alias("n_lines"),
        F.length(clean).cast("bigint").alias("n_chars_clean"),
    )


# ---------------------------------------------------------------------------
# Registered query: deterministic synthetic page per document, identical
# string built in the oracle SQL, so extraction is value-checked.
# ---------------------------------------------------------------------------


def synth_html(doc_id: Column, lang: Column, source: Column, text: Column) -> Column:
    """Deterministic messy HTML page for a document: script containing
    ``<`` comparisons (exercises block removal BEFORE generic tag
    stripping), style block, comment, heading with a raw entity,
    body text with an injected double-escaped entity, conditional
    list markup (``doc_id % 3``), and a footer with numeric-quote
    entities."""
    body = F.replace(
        text, F.lit(" value "), F.lit(" &amp;quot;value&quot; ")
    )
    return F.concat(
        F.lit('<HTML><head><title>'),
        source,
        F.lit('</title><style type="text/css">p { color: #333; }</style>'),
        F.lit('<script>if (a < b && c > d) { track("'),
        doc_id.cast("string"),
        F.lit('"); }</script></head><body><!-- doc '),
        doc_id.cast("string"),
        F.lit(' --><h1 id="t">Title &amp; '),
        lang,
        F.lit("</h1><p>"),
        body,
        F.lit("</p>"),
        F.when(
            doc_id % 3 == 0,
            F.lit(
                "<ul><li>alpha&nbsp;one</li>"
                "<li>beta &lt;tag&gt; two</li></ul>"
            ),
        ).otherwise(F.lit("")),
        F.lit('<br/><div class="footer">&#39;end&#39;</div></body></html>'),
    )


#: the oracle's restatement of :func:`synth_html` (DuckDB string concat)
_SYNTH_HTML_SQL = """
        '<HTML><head><title>' || source ||
        '</title><style type="text/css">p { color: #333; }</style>' ||
        '<script>if (a < b && c > d) { track("' || CAST(doc_id AS VARCHAR) ||
        '"); }</script></head><body><!-- doc ' || CAST(doc_id AS VARCHAR) ||
        ' --><h1 id="t">Title &amp; ' || lang || '</h1><p>' ||
        replace(text, ' value ', ' &amp;quot;value&quot; ') || '</p>' ||
        CASE WHEN doc_id % 3 = 0
             THEN '<ul><li>alpha&nbsp;one</li><li>beta &lt;tag&gt; two</li></ul>'
             ELSE '' END ||
        '<br/><div class="footer">&#39;end&#39;</div></body></html>'
"""


@query(
    "html_extract_text",
    tags=("text", "llm-pipeline", "web"),
    oracle=f"""
        WITH pages AS (
            SELECT doc_id, {_SYNTH_HTML_SQL} AS page FROM documents
        ),
        stripped AS (
            SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(page,
                    '(?i)<script\\b[^>]*>.*?</script>', ' ', 'g'),
                    '(?i)<style\\b[^>]*>.*?</style>', ' ', 'g'),
                    '<!--.*?-->', ' ', 'g'),
                    '(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote)\\b[^>]*>',
                    chr(10), 'g'),
                    '<[^>]*>', ' ', 'g') AS x
            FROM pages
        ),
        decoded AS (
            SELECT doc_id,
                replace(replace(replace(replace(replace(replace(x,
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                    '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS x
            FROM stripped
        ),
        collapsed AS (
            SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(x,
                    '[ \\t]+', ' ', 'g'),
                    '\\s*\\n\\s*', chr(10), 'g'),
                    '^\\s+|\\s+$', '', 'g') AS clean_text
            FROM decoded
        )
        SELECT doc_id, clean_text,
               CASE WHEN clean_text = '' THEN 0
                    ELSE CAST(len(string_split(clean_text, chr(10))) AS INT)
               END AS n_lines,
               CAST(length(clean_text) AS BIGINT) AS n_chars_clean
        FROM collapsed
    """,
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract visible text from the synthetic HTML wrapping of every
    document; oracle builds the identical page and restates the full
    strip/decode/collapse cascade."""
    from delta_lake_optimizations_spark.operators.dedup import spread_doc_rows

    documents = load_table(spark, sf_dir, "documents")
    # r12: the regex cascade is embarrassingly parallel, but a single-split
    # local corpus plans the whole scan stage as ONE task — spread the doc
    # rows when (and only when) the input can't feed the cores (measured:
    # sf5 12.4 -> 1.5 s; a no-op at any real input size). The extraction
    # operator itself stays exchange-free.
    pages = spread_doc_rows(documents, "doc_id").select(
        "doc_id",
        synth_html(
            F.col("doc_id"), F.col("lang"), F.col("source"), F.col("text")
        ).alias("page"),
    )
    return extract_documents(pages, "page")
