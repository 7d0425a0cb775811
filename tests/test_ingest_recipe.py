"""The 100 TB ingest recipe, end to end (VERDICT r06 #7): landing zone
-> COPY INTO bronze (idempotent file ledger) -> DLT drop-mode
expectations at the bronze write -> Unicode normalization (the r8 choke
point: mixed-form duplicates become byte-identical BEFORE
fingerprinting) -> FingerprintStore dedup into silver (exactly-once
batches, serializable admission) -> curation -> token-budget packed
gold shards. Every stage's contract is asserted, and the
silver survivor set — the stage whose semantics are SQL-expressible —
is value-checked against an independent DuckDB restatement."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.incremental_dedup import (
    FingerprintStore,
)
from delta_lake_optimizations_spark.operators.packing import pack_sequences
from delta_lake_optimizations_spark.operators.pipeline import curate_documents
from delta_lake_optimizations_spark.operators.textnorm import normalize_documents
from delta_lake_optimizations_spark.table import GraftTable
from delta_lake_optimizations_spark.table.copy_into import copy_into

from .conftest import SF_DIR, compare_spark_duckdb

_SILVER_ORACLE = """
    SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY md5(CAST(text AS VARCHAR))
                   ORDER BY pri, doc_id
               ) AS rn
        FROM (
            SELECT doc_id, text, 0 AS pri
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id, text, 1 AS pri
            FROM documents WHERE doc_id % 2 = 1
            UNION ALL
            SELECT doc_id + 1000000, text, 1 AS pri
            FROM documents WHERE doc_id % 2 = 0
        )
    ) WHERE rn = 1
"""


def test_ingest_recipe_end_to_end(spark, duck, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    rekeyed = evens.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    bad = spark.createDataFrame(
        [
            (2_000_000, None, "en", "junk", 0),
            (2_000_001, "", "en", "junk", 0),
            (2_000_002, "", "en", "junk", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    landing = str(tmp_path / "landing")
    evens.coalesce(1).write.parquet(os.path.join(landing, "drop_a"))

    # bronze: typed seed + drop-mode quality gate BEFORE anything lands
    bronze = GraftTable(spark, str(tmp_path / "bronze"))
    bronze.write(docs.limit(0))
    bronze.add_expectation(
        "valid_text", "text IS NOT NULL AND length(text) > 0", action="drop"
    )

    r1 = copy_into(bronze, landing)
    assert r1["num_rows"] == evens.count()
    batch1 = bronze.load(version=r1["version"])

    store = FingerprintStore(spark, str(tmp_path / "fp"))
    silver = GraftTable(spark, str(tmp_path / "silver"))
    kept1 = store.ingest(normalize_documents(batch1), "v1")
    silver.write(kept1)

    # second landing drop: the odd docs, cross-batch content duplicates
    # (re-keyed evens), MIXED-FORM duplicates (uppercased + zero-width
    # noise — byte-distinct, visually identical; only the normalization
    # stage makes them dedup), and three rows the expectation must drop
    mixed = evens.select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("\u200b")).alias("text"),
        "lang", "source", "n_chars",
    )
    odds.unionByName(rekeyed).unionByName(mixed).unionByName(bad).coalesce(
        1
    ).write.parquet(os.path.join(landing, "drop_b"))
    r2 = copy_into(bronze, landing)
    assert r2["skipped_files"] >= 1, "drop_a files must not re-ingest"
    # expectation observability: violation count in the commit params
    params = json.loads(
        bronze.history().orderBy(F.desc("version")).first()["operationParameters"]
    )
    assert params["expectations"]["valid_text"] == {
        "action": "drop",
        "violations": 3,
    }
    assert (
        bronze.load()
        .filter((F.col("doc_id") >= 2_000_000) & (F.col("doc_id") < 3_000_000))
        .count()
        == 0
    )

    batch2 = bronze.load(version=r2["version"]).join(
        batch1.select("doc_id"), "doc_id", "left_anti"
    )
    kept2 = store.ingest(normalize_documents(batch2), "v2")
    silver.write(kept2, mode="append")

    # idempotency: a third COPY INTO is a no-op commit-wise, and
    # replaying batch v2 returns the original survivors without a commit
    assert copy_into(bronze, landing)["num_files"] == 0
    n_store_commits = len(store.table.commits())
    replay = store.ingest(normalize_documents(batch2), "v2")
    assert len(store.table.commits()) == n_store_commits
    assert sorted(r["doc_id"] for r in replay.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in kept2.select("doc_id").collect()
    )

    # every mixed-form variant normalized to an already-admitted text,
    # so none of them survive (without the normalization stage they all
    # would: byte-distinct fingerprints)
    assert silver.load().filter(F.col("doc_id") >= 3_000_000).count() == 0

    # the silver survivor set is exactly first-seen-wins over the two
    # drops — value-checked against an independent SQL restatement
    compare_spark_duckdb(silver.load().select("doc_id"), duck, _SILVER_ORACLE)

    # curate + pack the silver corpus into gold shards
    curated = curate_documents(silver.load())
    packed = pack_sequences(
        curated, token_col="n_tokens", order_col="doc_id",
        partition_col="pred_lang", budget=128,
    )
    gold = GraftTable(spark, str(tmp_path / "gold"))
    gold.write(packed, partition_by=["pred_lang"])

    out = gold.load()
    assert out.count() == curated.count() > 0
    assert out.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 128)
    ).count() == 0
    # every (shard, pack) is a contiguous run: offsets are the running
    # sum of prior token counts, so the minimum offset of pack 0 is 0
    first_packs = out.filter(F.col("pack_id") == 0).groupBy("pred_lang").agg(
        F.min("pack_offset").alias("o")
    )
    assert all(r["o"] == 0 for r in first_packs.collect())


def test_html_recrawl_dedups_after_extraction_stage(spark, tmp_path):
    """Stage-0 composition (r9): the same page arriving once as plain
    text and once as RAW HTML must admit exactly once — extraction
    (htmlextract) recovers the visible text, normalization canonicalizes
    it, and the FingerprintStore then sees an already-admitted
    fingerprint. Without the extraction stage every HTML re-crawl would
    pass dedup as a 'new' document (the markup differs even when the
    page does not)."""
    from delta_lake_optimizations_spark.catalog import load_table
    from delta_lake_optimizations_spark.operators.htmlextract import (
        extract_documents,
    )
    from delta_lake_optimizations_spark.operators.incremental_dedup import (
        FingerprintStore,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    store = FingerprintStore(spark, str(tmp_path / "fp_store"))

    kept1 = store.ingest(docs, "plain")
    assert kept1.count() > 0

    # the re-crawl: same pages, now wrapped in markup whose only visible
    # content is the original text (script/style/comment are invisible)
    pages = docs.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(
            F.lit('<html><head><style>p{x:1}</style>'
                  '<script>if (a < b) { t("x"); }</script></head>'
                  "<body><!-- re-crawl --><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("page"),
    )
    extracted = extract_documents(pages, "page").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    kept2 = store.ingest(extracted, "html-recrawl")
    assert kept2.count() == 0, "every extracted re-crawl must dedup away"

    # control: WITHOUT extraction the raw markup defeats dedup
    raw = pages.select("doc_id", F.col("page").alias("text"))
    kept3 = store.ingest(raw, "html-raw-control")
    assert kept3.count() == pages.count()
