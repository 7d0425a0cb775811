"""HTML -> text extraction: semantics on handcrafted pages, plan shape
(map-only codegen, no UDFs), and oracle parity of the registered query."""

from __future__ import annotations

import pyspark.sql.functions as F

from .conftest import SF_DIR, compare_spark_duckdb
from delta_lake_optimizations_spark.operators.htmlextract import (
    extract_documents,
    html_to_text,
)
from delta_lake_optimizations_spark.plans.inspect import plan_summary
from delta_lake_optimizations_spark.registry import registry

_DEFS = registry()


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "page string")
    return df.select(html_to_text(F.col("page")).alias("t")).collect()[0]["t"]


def test_script_style_comment_removed(spark):
    page = (
        '<html><head><style>p {color: red}</style>'
        '<script>if (a < b && c > d) { x("hi"); }</script></head>'
        "<body><!-- secret -->visible</body></html>"
    )
    assert _extract(spark, page) == "visible"


def test_block_tags_become_newlines(spark):
    page = "<body><h1>title</h1><p>one</p><p>two</p><ul><li>a</li><li>b</li></ul></body>"
    assert _extract(spark, page) == "title\none\ntwo\na\nb"


def test_inline_tags_become_spaces(spark):
    page = "<p>one <b>bold</b> two<br/>three</p>"
    assert _extract(spark, page) == "one bold two\nthree"


def test_entity_decode_order(spark):
    # &amp; decodes LAST: "&amp;lt;" is the TEXT "&lt;" (one level per
    # pass), never re-decoded to "<"
    page = "<p>&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp; &amp;lt;raw</p>"
    assert _extract(spark, page) == '<tag> "q" \'s\' a b & &lt;raw'


def test_attributes_and_case_insensitive_tags(spark):
    page = '<DIV CLASS="x">a</DIV><SCRIPT type="t">var y = 1 < 2;</SCRIPT><P>b</P>'
    assert _extract(spark, page) == "a\nb"


def test_whitespace_collapse_and_trim(spark):
    page = "<p>  a   b  </p><p>   </p><p>c</p>"
    assert _extract(spark, page) == "a b\nc"


def test_empty_and_tagless_input(spark):
    assert _extract(spark, "") == ""
    assert _extract(spark, "plain text only") == "plain text only"


def test_extract_documents_line_counts(spark):
    df = spark.createDataFrame(
        [(1, "<p>a</p><p>b</p>"), (2, "<script>x</script>")],
        "doc_id int, page string",
    )
    rows = {
        r["doc_id"]: r
        for r in extract_documents(df, "page").collect()
    }
    assert rows[1]["clean_text"] == "a\nb"
    assert rows[1]["n_lines"] == 2
    assert rows[1]["n_chars_clean"] == 3
    assert rows[2]["clean_text"] == ""
    assert rows[2]["n_lines"] == 0


def test_html_extract_plan_is_map_only(spark):
    """The extraction chain must run at scan speed: no Python evaluation,
    no joins/aggregates — at most ONE exchange, the conditional
    spread_doc_rows repartition that un-serializes single-split local
    corpora (r12; a no-op when input splits feed the cores). The
    extraction OPERATOR itself stays exchange-free (second assertion,
    on the raw operator)."""
    df = _DEFS["html_extract_text"].fn(spark, SF_DIR)
    s = plan_summary(df)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert s["exchanges"] <= 1, "HTML extraction must stay map-only"
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text

    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.operators.htmlextract import (
        extract_documents,
    )

    op = extract_documents(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", F.col("text").alias("page")
        ),
        "page",
    )
    assert plan_summary(op)["exchanges"] == 0, "operator must be map-only"


def test_html_extract_text_oracle_parity(spark, duck):
    qd = _DEFS["html_extract_text"]
    compare_spark_duckdb(qd.fn(spark, SF_DIR), duck, qd.oracle)
