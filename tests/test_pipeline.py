"""Curation-pipeline integration: curate -> land in a GraftTable ->
optimize -> stats — the end-to-end training-data flow on the engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.pipeline import curate_documents
from delta_lake_optimizations_spark.stats import StatisticsStore
from delta_lake_optimizations_spark.table import GraftTable, optimize

from .conftest import SF_DIR


def test_curation_lands_in_versioned_table(spark, tmp_path):
    base = load_table(spark, SF_DIR, "documents")
    # inject exact duplicates (new ids, same text) plus junk that the
    # quality filters must drop
    dupes = base.limit(20).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    junk = spark.createDataFrame(
        [(2_000_000 + i, "!!! ??? ...", "und", "synthetic") for i in range(5)],
        "doc_id long, text string, lang string, source string",
    )
    docs = base.unionByName(dupes.select(*base.columns)).unionByName(
        junk.select(*[c for c in base.columns if c in junk.columns]
                    + [F.lit(None).cast("string").alias(c)
                       for c in base.columns if c not in junk.columns]),
        allowMissingColumns=True,
    ).select(*base.columns)
    curated = curate_documents(docs)

    n_in, n_out = docs.count(), curated.count()
    assert 0 < n_out < n_in  # junk filtered, duplicates collapsed
    # every duplicated text is represented once, by its LOWEST id (the
    # original, not the +1M copy)
    assert curated.filter(F.col("doc_id") >= 1_000_000).count() == 0
    assert curated.filter(F.col("n_copies") == 2).count() == 20
    assert curated.select("doc_id").distinct().count() == n_out

    t = GraftTable(spark, str(tmp_path / "curated"))
    t.write(curated.repartition(4), properties={"delta.stats.extended.collect": "true"})
    optimize(t, target_file_mb=512)
    assert t.load().count() == n_out
    assert StatisticsStore(t).get()["rowCount"] == n_out
    ops = [r["operation"] for r in t.history().collect()]
    assert ops == ["OPTIMIZE", "CREATE TABLE AS SELECT"]


def test_curation_incremental_merge(spark, tmp_path):
    """Second curation run upserts via MERGE — the incremental pattern."""
    from delta_lake_optimizations_spark.table.merge import merge

    docs = load_table(spark, SF_DIR, "documents")
    curated = curate_documents(docs)
    t = GraftTable(spark, str(tmp_path / "cur"))
    t.write(curated.repartition(2))
    n0 = t.load().count()

    # re-run over the same corpus: all keys match, nothing new inserted
    commit = merge(t, curate_documents(docs), on=["doc_id"],
                   when_matched_update="*", when_not_matched_insert="*")
    assert t.load().count() == n0
    assert t.history().collect()[0]["operation"] == "MERGE"
    assert commit.operation_parameters["numTargetFilesRewritten"] >= 1


def test_chunk_windows_edge_cases(spark):
    from delta_lake_optimizations_spark.operators.textstats import chunk_windows

    df = spark.createDataFrame(
        [
            (1, ""),               # empty: dropped entirely
            (2, "x" * 100),        # shorter than one chunk: 1 chunk
            (3, "y" * 500),        # exactly one chunk size: starts 0 and 400
            (4, "z" * 900),        # 0,400,800 -> 3 chunks, last is 100 long
        ],
        "doc_id INT, text STRING",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_len"])
        for r in chunk_windows(df, "doc_id", "text", size=500, stride=400).collect()
    }
    assert not any(k[0] == 1 for k in rows)
    assert rows[(2, 0)] == (0, 100)
    assert rows[(3, 0)] == (0, 500) and rows[(3, 1)] == (400, 100)
    assert rows[(4, 2)] == (800, 100)
    assert len(rows) == 6
    # every chunk covers the doc with the declared overlap: successive
    # starts differ by exactly the stride
    starts_4 = sorted(v[0] for k, v in rows.items() if k[0] == 4)
    assert starts_4 == [0, 400, 800]


def test_chunk_embed_deterministic_and_shuffle_free(spark):
    from delta_lake_optimizations_spark.operators.pipeline import pipeline_chunk_embed
    from delta_lake_optimizations_spark.plans.inspect import plan_summary

    from .conftest import SF_DIR

    a = pipeline_chunk_embed(spark, SF_DIR)
    assert plan_summary(a)["exchanges"] == 0  # pure scan-speed ingest
    # the registered query serializes the vector driver-safely (CSV of
    # fixed-precision floats); parse it back for the value checks
    ra = {(r["doc_id"], r["chunk_idx"]): r["embedding_csv"] for r in a.collect()}
    rb = {(r["doc_id"], r["chunk_idx"]): r["embedding_csv"]
          for r in pipeline_chunk_embed(spark, SF_DIR).collect()}
    assert ra == rb and ra  # deterministic across runs
    for s in list(ra.values())[:20]:
        v = [float(x) for x in s.split(",")]
        assert len(v) == 8 and all(-1.0 <= x < 1.0 for x in v)
