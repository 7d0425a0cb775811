"""URL curation operators (operators/webcure.py): normalization
semantics, registered-domain PSL branch, idempotence, and plan shape.
Oracle value-parity for the three registered queries is covered by
tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.webcure import (
    registered_domain,
    url_host,
    url_normalize,
)
from delta_lake_optimizations_spark.plans.inspect import plan_summary
from delta_lake_optimizations_spark.registry import registry

from .conftest import SF_DIR

_DEFS = registry()


def _normalize_one(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(url_normalize(F.col("url")).alias("n")).first()["n"]


def test_url_normalize_semantics(spark):
    cases = {
        # case, www, fragment, tracking params, param order, trailing slash
        "HTTPS://WWW.Ex.CO.UK/A/b/?utm_source=x&b=2&a=1&ref=r#frag":
            "https://ex.co.uk/A/b?a=1&b=2",
        "http://example.com/": "http://example.com/",
        "http://example.com": "http://example.com/",
        "https://example.com/p?gclid=1&fbclid=2&utm_campaign=c":
            "https://example.com/p",
        "https://sub.Example.DE/Path//?z=9&y=8": "https://sub.example.de/Path?y=8&z=9",
    }
    for raw, want in cases.items():
        assert _normalize_one(spark, raw) == want, raw


def test_url_normalize_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) on the corpus URLs — the
    canonical form is a fixed point."""
    from delta_lake_optimizations_spark.operators.webcure import _doc_urls

    df = _doc_urls(spark, SF_DIR).select(
        "url_norm", url_normalize(F.col("url_norm")).alias("twice")
    )
    assert df.filter(F.col("url_norm") != F.col("twice")).count() == 0


def test_registered_domain_psl_branch(spark):
    cases = {
        "news.bbc.co.uk": "bbc.co.uk",
        "bbc.co.uk": "bbc.co.uk",
        "a.b.example.com": "example.com",
        "example.de": "example.de",
        "localhost": "localhost",
        "shop.taobao.com.cn": "taobao.com.cn",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", registered_domain(F.col("host")).alias("rd")
        ).collect()
    }
    assert got == cases


def test_url_queries_plan_shape(spark):
    """url_normalize_docs must run at scan speed (0 exchanges, no UDFs in
    the plan); dedup adds exactly the one url_norm hash shuffle."""
    df = _DEFS["url_normalize_docs"].fn(spark, SF_DIR)
    s = plan_summary(df)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert s["exchanges"] == 0, "URL normalization must be map-only"
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text

    dd = _DEFS["dedup_url_normalized"].fn(spark, SF_DIR)
    sd = plan_summary(dd)
    assert sd["exchanges"] == 1, "URL dedup is one hash shuffle"
    assert not sd["global_window"], "dedup window must partition by url_norm"


def test_dedup_url_normalized_removes_tracking_dupes(spark):
    """Docs sharing (domain, path bucket) after normalization collapse to
    one survivor even though their raw URLs all differ (fragment +
    doc_id-dependent params)."""
    from delta_lake_optimizations_spark.operators.webcure import _doc_urls

    docs = _doc_urls(spark, SF_DIR)
    n_docs = docs.count()
    n_raw = docs.select("url").distinct().count()
    n_norm = docs.select("url_norm").distinct().count()
    survivors = _DEFS["dedup_url_normalized"].fn(spark, SF_DIR).count()
    assert n_raw == n_docs, "raw URLs are all distinct by construction"
    assert n_norm < n_raw, "normalization must create real duplicate groups"
    assert survivors == n_norm
