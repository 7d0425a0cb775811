"""Web-corpus URL curation (SURVEY §2.9 north-star extension).

Large-scale text pipelines (C4, CCNet, RefinedWeb — see PAPERS.md) key
much of their curation on the page URL: tracking-parameter noise makes
one page look like many (inflating the corpus and defeating dedup), and
per-site quotas / blocklists need a stable *registered domain* (eTLD+1)
rather than the raw host. This module provides those primitives as pure
per-row Spark expressions:

- ``url_normalize``: lowercase scheme/host, strip ``www.``, drop the
  fragment, remove tracking parameters (``utm_*``, ``ref``, ``gclid``,
  ``fbclid``), sort the surviving query parameters, collapse trailing
  slashes — the canonical form two crawls of the same page share.
- ``registered_domain``: eTLD+1 via a small embedded two-level-suffix
  table (the public-suffix-list pattern; the full PSL is a data file, the
  algorithm is identical).

Scale: every expression is a row-local projection (regex + array ops in
whole-stage codegen, zero shuffles, zero UDFs). The dedup query adds one
hash shuffle on the normalized URL; the domain profile is one hash
aggregate — both the minimum possible for their semantics at 100 TB.

The driver corpus has no URL column, so the registered queries derive a
deterministic URL per document from (source, lang, doc_id) — mixed-case
host, tracking params, fragment, unsorted params — and the oracle SQL
builds the identical string, so normalization semantics are value-checked
end-to-end against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query

# Two-level public suffixes the heuristic recognises (the PSL pattern:
# if the last two labels form one of these, the registered domain keeps
# three labels; otherwise two).
TWO_LEVEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "gov.uk",
    "ac.uk",
    "com.cn",
    "com.au",
    "co.jp",
    "com.br",
)

#: params stripped by normalization (tracking / click-id noise)
_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|ref|gclid|fbclid)="


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, "^([A-Za-z]+)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped."""
    host = F.lower(F.regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_path(url: Column) -> Column:
    """Path with trailing slashes collapsed ('' -> '/')."""
    raw = F.regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    stripped = F.regexp_replace(raw, "/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def url_query_normalized(url: Column) -> Column:
    """Query string with tracking params removed and the rest sorted
    (param order is transport noise, not page identity)."""
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    parts = F.split(qs, "&")
    kept = F.filter(parts, lambda p: (p != "") & ~p.rlike(_TRACKING_RE))
    return F.array_join(F.array_sort(kept), "&")


def url_normalize(url: Column) -> Column:
    """Canonical URL: lower scheme/host, no www., no fragment, no
    tracking params, sorted query, collapsed trailing slash."""
    q = url_query_normalized(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1 of an already-lowercased host: keep three labels when the
    last two form a known two-level suffix, else two (clamped to the
    label count)."""
    labels = F.split(host, "[.]")
    n = F.size(labels)
    last_two = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    take = F.when(
        last_two.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3), F.lit(3)
    ).otherwise(F.least(n, F.lit(2)))
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


# ---------------------------------------------------------------------------
# Registered queries: deterministic synthetic URL per document, identical
# string built in the oracle SQL, so the operators are value-checked.
# ---------------------------------------------------------------------------


def synth_url(lang: Column, source: Column, doc_id: Column) -> Column:
    """Deterministic messy URL for a document: mixed-case scheme/host/www,
    language-dependent ccTLD (two-level for en/zh so the PSL branch is
    exercised), a bucketed path ``(doc_id // 20) % 11`` (deliberately NOT
    a plain ``doc_id % k``, which would be injective because ``source``
    already cycles ``doc_id % 20`` — this gives 74-85 real duplicate
    groups per 500 docs for the dedup query), tracking params mixed
    with unsorted real params, and a fragment."""
    suffix = (
        F.when(lang == "en", F.lit("co.uk"))
        .when(lang == "zh", F.lit("com.cn"))
        .otherwise(lang)
    )
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(source),
        F.lit("."),
        suffix,
        F.lit("/Articles/Item-"),
        ((doc_id / 20).cast("long") % 11).cast("string"),
        F.lit("?utm_source=feed&b=2&ref="),
        lang,
        F.lit("&a=1&gclid=XYZ#section-"),
        doc_id.cast("string"),
    )


# the same URL in DuckDB SQL (kept adjacent so drift is visible in review)
_SYNTH_URL_SQL = """
    'HTTPS://WWW.' || upper(source) || '.'
    || CASE WHEN lang = 'en' THEN 'co.uk'
            WHEN lang = 'zh' THEN 'com.cn'
            ELSE lang END
    || '/Articles/Item-' || ((doc_id // 20) % 11)
    || '?utm_source=feed&b=2&ref=' || lang || '&a=1&gclid=XYZ#section-'
    || doc_id
"""

_NORM_SQL = """
    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
    || regexp_replace(
           lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
           '^www\\.', '')
    || CASE WHEN regexp_replace(
                regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                '/+$', '') = ''
            THEN '/'
            ELSE regexp_replace(
                regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                '/+$', '') END
    || CASE WHEN array_to_string(list_sort(list_filter(
                string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                p -> p <> '' AND NOT regexp_matches(
                    p, '^(utm_[A-Za-z0-9_]*|ref|gclid|fbclid)='))), '&') = ''
            THEN ''
            ELSE '?' || array_to_string(list_sort(list_filter(
                string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                p -> p <> '' AND NOT regexp_matches(
                    p, '^(utm_[A-Za-z0-9_]*|ref|gclid|fbclid)='))), '&') END
"""

_DOMAIN_SQL = """
    array_to_string(
        list_slice(
            string_split(host, '.'),
            len(string_split(host, '.'))
              - (CASE WHEN len(string_split(host, '.')) >= 3
                       AND array_to_string(list_slice(
                               string_split(host, '.'),
                               len(string_split(host, '.')) - 1,
                               len(string_split(host, '.'))), '.')
                           IN ('co.uk','org.uk','gov.uk','ac.uk',
                               'com.cn','com.au','co.jp','com.br')
                      THEN 3
                      ELSE least(len(string_split(host, '.')), 2) END) + 1,
            len(string_split(host, '.'))),
        '.')
"""


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = synth_url(F.col("lang"), F.col("source"), F.col("doc_id"))
    norm = url_normalize(url)
    return docs.select(
        "doc_id",
        url.alias("url"),
        norm.alias("url_norm"),
        registered_domain(url_host(url)).alias("domain"),
    )


_URL_CTE = f"""
    WITH urls AS (
        SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents
    ),
    normed AS (
        SELECT
            doc_id,
            url,
            {_NORM_SQL} AS url_norm,
            regexp_replace(
                lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                '^www\\.', '') AS host
        FROM urls
    ),
    enriched AS (
        SELECT doc_id, url, url_norm, {_DOMAIN_SQL} AS domain FROM normed
    )
"""


@query(
    "url_normalize_docs",
    tags=("webcure", "text"),
    oracle=_URL_CTE + "SELECT doc_id, url, url_norm, domain FROM enriched",
)
def url_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document URL normalization + registered domain — pure row-local
    projections (regex/array expressions, zero shuffles, zero UDFs)."""
    return _doc_urls(spark, sf_dir)


@query(
    "dedup_url_normalized",
    tags=("webcure", "dedup"),
    oracle=_URL_CTE
    + """
    SELECT doc_id, url_norm
    FROM (
        SELECT doc_id, url_norm,
               ROW_NUMBER() OVER (PARTITION BY url_norm ORDER BY doc_id)
                   AS rn
        FROM enriched
    )
    WHERE rn = 1
    """,
)
def dedup_url_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup after normalization (the step that makes
    tracking-param noise stop defeating dedup): lowest doc_id survives
    per canonical URL. One hash shuffle on url_norm — same plan shape as
    ``dedup_exact_text``."""
    w = Window.partitionBy("url_norm").orderBy("doc_id")
    return (
        _doc_urls(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "url_norm")
    )


def filter_blocked_domains(
    docs: DataFrame, blocklist: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted — a broadcast
    LEFT ANTI join, not an ``isin`` literal: real blocklists run to
    hundreds of thousands of domains (far past literal-expression
    limits) yet still fit comfortably in a broadcast, so the corpus side
    streams map-only at any scale."""
    bl = F.broadcast(blocklist.select(F.col(blocklist.columns[0]).alias(domain_col)))
    return docs.join(bl, on=domain_col, how="left_anti")


@query(
    "url_blocklist_filter",
    tags=("webcure", "filter"),
    oracle=_URL_CTE
    + """
    SELECT doc_id, domain
    FROM enriched
    WHERE domain NOT IN ('src1.co.uk', 'src4.com.cn', 'src7.de')
    """,
)
def url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering on the registered domain (the site-level ban
    rule every web pipeline applies before quality scoring): broadcast
    anti-join against a domain blocklist."""
    blocklist = spark.createDataFrame(
        [("src1.co.uk",), ("src4.com.cn",), ("src7.de",)], "domain string"
    )
    return filter_blocked_domains(
        _doc_urls(spark, sf_dir).select("doc_id", "domain"), blocklist
    )


@query(
    "url_domain_profile",
    tags=("webcure", "agg"),
    oracle=_URL_CTE
    + """
    SELECT
        domain,
        COUNT(*) AS n_docs,
        COUNT(DISTINCT url_norm) AS n_pages,
        COUNT(*) - COUNT(DISTINCT url_norm) AS n_dup_docs,
        ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM enriched), 6)
            AS share
    FROM enriched
    GROUP BY domain
    """,
)
def url_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus profile (doc count, distinct canonical
    pages, duplicate docs, corpus share) — the input to per-site quota
    rules (``sampling.cap_group_share``). One hash aggregate."""
    docs = _doc_urls(spark, sf_dir)
    total = docs.count()  # metadata-sized scalar (one count of the corpus)
    return docs.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("url_norm").alias("n_pages"),
        (F.count("*") - F.countDistinct("url_norm")).alias("n_dup_docs"),
        F.round(F.count("*") / F.lit(float(total)), 6).alias("share"),
    )
