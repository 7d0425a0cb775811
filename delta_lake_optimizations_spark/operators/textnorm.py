"""Unicode text normalization choke point (VERDICT r07 #5).

Real multilingual crawl contains visually identical texts that differ in
bytes — decomposed vs composed accents (NFC), zero-width
joiners/spaces/BOM/soft hyphens, case — and every fingerprint in this
engine (exact dedup sha2, MinHash grams, BPE words, decontamination
grams) would treat them as distinct, silently letting duplicates dodge
every filter. One shared ``normalize_text`` fixes that at a single
choke point, in two tiers chosen for plan shape:

- **light tier (pure codegen)** — ``strip_invisible`` + lower: wired
  into the shared tokenizers (``dedup.tokenize``, ``bpe.pre_tokenize``),
  so every gram/fingerprint path drops zero-width characters without
  leaving whole-stage codegen (the r05 gram-path lesson: the tokenizer
  runs inside the hottest loops in the engine — no Python allowed).
- **full tier (Arrow-batched)** — NFC + strip + lower via one
  vectorized ``pandas_udf`` (``pandas.Series.str.normalize``): the
  INGEST-time form. The 100 TB recipe normalizes ONCE when a document
  enters the lake (curation pipeline writes the normalized text), not
  in every downstream gram enumeration — so the UDF cost is paid once
  per byte, and every fingerprint thereafter rides codegen.

Casefold choice: ``lower()``, not Python ``str.casefold()`` — casefold
maps one codepoint to several for a handful of letters, and lower() is
what the DuckDB oracle (and SQL generally) can restate, so engine and
oracle stay value-comparable. Documented trade, same on both sides.

Oracle strategy: the test corpora contain no zero-width/NFC/case
variance (verified — the driver's generated documents are lowercase
ASCII), so normalizing the shared tokenizers changes no registered
query's output there; parity of the normalization ITSELF is proven by
two fully oracle-backed queries that CONSTRUCT mixed-form text
identically on both sides (the ``webcure`` synthetic-URL pattern):
``normalize_text_docs`` pins Python-NFC == DuckDB ``nfc_normalize`` on
adversarial probes, and ``dedup_normalized_forms`` proves mixed-form
duplicates collapse ONLY under normalization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query

# zero-width space/non-joiner/joiner, word joiner, BOM/ZWNBSP, soft hyphen
INVISIBLES = "​‌‍⁠﻿­"
_INVISIBLE_CLASS = "[" + INVISIBLES + "]"


def strip_invisible(col: Column) -> Column:
    """Remove zero-width characters — pure codegen (regexp_replace)."""
    return F.regexp_replace(col, _INVISIBLE_CLASS, "")


def light_normalize(col: Column) -> Column:
    """Codegen-only normalization: strip invisibles + lower + trim.
    The shared tokenizers build on this (no NFC — that needs the full
    tier below; a token path must stay JVM-side)."""
    return F.lower(F.trim(strip_invisible(col)))


def normalize_text_col(col: Column) -> Column:
    """Full normalization: NFC -> strip invisibles -> lower, as one
    Arrow-batched vectorized UDF (map-only; zero exchanges). Apply at
    INGEST, store the result, and every downstream fingerprint becomes
    byte-stable across visually identical forms."""

    def norm(s: pd.Series) -> pd.Series:
        out = s.fillna("").str.normalize("NFC")
        for ch in INVISIBLES:
            out = out.str.replace(ch, "", regex=False)
        return out.str.lower()

    norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf("string")(norm)
    return udf(col)


def normalize_documents(
    df: DataFrame, text_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """Ingest-time normalization step: rewrite ``text_col`` through the
    full tier. Designed to sit between COPY INTO and the fingerprint
    store in the ingest recipe."""
    return df.withColumn(out_col, normalize_text_col(F.col(text_col)))


# --- oracle-backed parity probes ------------------------------------------

# adversarial probe pieces, embedded as REAL characters in both the
# Spark literals and the DuckDB SQL below (same construction both
# sides, so the VALUES check pins engine-vs-engine NFC/lower parity):
#   composed e-acute vs decomposed e + COMBINING ACUTE
#   o-umlaut composed vs decomposed; uppercase; zero-width injections
_COMPOSED = "Café ÖL"          # Café ÖL (composed forms)
_DECOMPOSED = "Café ÖL"       # same text, decomposed forms
_ZW_INJECTED = "Ca​fé Ö‍L﻿"  # + zero-width noise


@query(
    "normalize_text_docs",
    tags=("text", "normalize", "llm-pipeline"),
    oracle=f"""
        SELECT doc_id,
               lower(regexp_replace(
                   nfc_normalize(text || ' ' || '{_DECOMPOSED}'),
                   '{_INVISIBLE_CLASS}', '', 'g'
               )) AS norm_composed,
               lower(regexp_replace(
                   nfc_normalize(text || ' ' || '{_ZW_INJECTED}'),
                   '{_INVISIBLE_CLASS}', '', 'g'
               )) AS norm_zw
        FROM documents
    """,
)
def normalize_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-tier normalization parity: every document's text is extended
    with a DECOMPOSED mixed-case probe and a zero-width-injected probe
    (both built identically in the oracle), then normalized. Values match
    only if Python's unicodedata NFC, the invisible-strip, and lower()
    agree byte-for-byte with DuckDB's nfc_normalize/regexp_replace/lower
    on every document."""
    from delta_lake_optimizations_spark.operators.dedup import spread_doc_rows

    docs = load_table(spark, sf_dir, "documents")
    # r12: the Arrow NFC pass is map-only; spread so a single-split local
    # corpus doesn't serialize it on one task (no-op at real input sizes)
    docs = spread_doc_rows(docs, "doc_id")
    return docs.select(
        "doc_id",
        normalize_text_col(
            F.concat(F.col("text"), F.lit(" " + _DECOMPOSED))
        ).alias("norm_composed"),
        normalize_text_col(
            F.concat(F.col("text"), F.lit(" " + _ZW_INJECTED))
        ).alias("norm_zw"),
    )


@query(
    "dedup_normalized_forms",
    tags=("dedup", "normalize", "llm-pipeline"),
    oracle=f"""
        WITH variants AS (
            SELECT doc_id, text || ' ' || '{_COMPOSED}' AS text
            FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text || ' ' || '{_DECOMPOSED}' AS text
            FROM documents
            UNION ALL
            SELECT doc_id + 2000000, text || ' ' || '{_ZW_INJECTED}' AS text
            FROM documents
        )
        SELECT doc_id FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lower(regexp_replace(
                           nfc_normalize(text), '{_INVISIBLE_CLASS}', '', 'g'
                       ))
                       ORDER BY doc_id
                   ) AS rn
            FROM variants
        ) WHERE rn = 1
    """,
)
def dedup_normalized_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user story behind the choke point: three visually identical
    variants of every document (composed, decomposed, zero-width-
    injected — re-keyed so they are distinct rows) must collapse to ONE
    survivor under exact dedup on the NORMALIZED fingerprint. Without
    normalization they dodge every fingerprint (pinned by pytest); with
    it the survivor set is the original min-id docs, value-checked."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = (
        docs.withColumn("text", F.concat("text", F.lit(" " + _COMPOSED)))
        .unionByName(
            docs.select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat("text", F.lit(" " + _DECOMPOSED)).alias("text"),
            )
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat("text", F.lit(" " + _ZW_INJECTED)).alias("text"),
            )
        )
    )
    from pyspark.sql import Window

    normed = variants.withColumn("_norm", normalize_text_col(F.col("text")))
    w = Window.partitionBy("_norm").orderBy("doc_id")
    return (
        normed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
