"""Streaming-sink tests: micro-batches land as transactional GraftTable
appends, counts match the source, history records batch ids, and replaying
a committed batch is a no-op (idempotence)."""

from __future__ import annotations

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.streaming.events_stream import read_events_stream
from delta_lake_optimizations_spark.streaming.graft_sink import (
    GraftStreamWriter,
    write_stream_to_graft,
)
from delta_lake_optimizations_spark.table import GraftTable

from .conftest import SF_DIR


def test_stream_appends_into_graft_table(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    load_table(spark, SF_DIR, "events").repartition(3).write.parquet(src_dir)

    table = GraftTable(spark, str(tmp_path / "events_graft"))
    q = write_stream_to_graft(
        read_events_stream(spark, src_dir),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    n_src = spark.read.parquet(src_dir).count()
    assert table.load().count() == n_src
    commits = table.commits()
    # one commit per micro-batch (maxFilesPerTrigger=1 over 3 files)
    assert len(commits) == 3
    batch_ids = [c.operation_parameters.get("streamingBatchId") for c in commits]
    assert batch_ids == [0, 1, 2]


def test_replayed_batch_is_noop(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    df = load_table(spark, SF_DIR, "events").limit(100)
    df.repartition(1).write.parquet(src_dir)

    table = GraftTable(spark, str(tmp_path / "t"))
    writer = GraftStreamWriter(table)
    batch = spark.read.parquet(src_dir)
    writer(batch, 0)
    n1 = table.load().count()
    writer(batch, 0)  # replay after simulated restart
    assert table.load().count() == n1
    assert len(table.commits()) == 1
    writer(batch, 1)  # a genuinely new batch appends
    assert table.load().count() == 2 * n1


def test_stream_merge_upserts_latest_per_key(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.streaming.graft_sink import (
        GraftStreamMergeWriter,
    )

    table = GraftTable(spark, str(tmp_path / "t"))
    writer = GraftStreamMergeWriter(table, on=["k"], sequence_col="seq")

    b0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b"), (2, 12, "b2")], "k INT, seq INT, v STRING"
    )
    writer(b0, 0)
    # first batch: latest-per-key kept (k=2 resolves to seq 12)
    got = {r["k"]: (r["seq"], r["v"]) for r in table.load().collect()}
    assert got == {1: (10, "a"), 2: (12, "b2")}

    b1 = spark.createDataFrame(
        [(2, 20, "b3"), (3, 21, "c")], "k INT, seq INT, v STRING"
    )
    writer(b1, 1)
    got = {r["k"]: (r["seq"], r["v"]) for r in table.load().collect()}
    assert got == {1: (10, "a"), 2: (20, "b3"), 3: (21, "c")}

    writer(b1, 1)  # replay is a no-op
    assert table.load().count() == 3
    assert len(table.commits()) == 2
    assert [c.operation_parameters.get("streamingBatchId") for c in table.commits()] == [0, 1]
    assert table.commits()[-1].operation == "MERGE"


def test_upsert_stream_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.streaming.graft_sink import (
        upsert_stream_to_graft,
    )

    src_dir = str(tmp_path / "src")
    events = load_table(spark, SF_DIR, "events").limit(300)
    # one row per user: last event wins — classic CDC latest-state table
    events.repartition(3).write.parquet(src_dir)

    table = GraftTable(spark, str(tmp_path / "state"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = upsert_stream_to_graft(
        stream, table, on=["user_id"], sequence_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = table.load()
    src = spark.read.parquet(src_dir)
    assert got.count() == src.select("user_id").distinct().count()
    # spot-check: every stored ts is the max ts <= source max for that user
    mx = {r["user_id"]: r["m"] for r in
          src.groupBy("user_id").agg(F.max("ts").alias("m")).collect()}
    for r in got.select("user_id", "ts").limit(50).collect():
        assert r["ts"] <= mx[r["user_id"]]


def test_stream_maintains_matview_per_batch(spark, tmp_path):
    """The append sink with an attached matview keeps the aggregate
    current after EVERY micro-batch: final view equals a full recompute
    and the view accumulated one refresh per non-initial batch."""
    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.streaming.graft_sink import (
        write_stream_to_graft_with_matview,
    )
    from delta_lake_optimizations_spark.table import create_matview, matview_is_fresh

    src_dir = str(tmp_path / "src")
    load_table(spark, SF_DIR, "events").repartition(3).write.parquet(src_dir)

    table = GraftTable(spark, str(tmp_path / "events_graft"))
    # seed the table + view with an empty-but-typed snapshot via batch 0:
    # start with one file, then stream the rest
    # cast to the stream reader's TIMESTAMP flavor so appends line up
    first = spark.read.parquet(src_dir).limit(0).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    table.write(first)
    view = create_matview(
        spark,
        table,
        str(tmp_path / "mv"),
        ["event_type"],
        {"n": ["count"], "total": ["sum", "value"]},
    )

    q = write_stream_to_graft_with_matview(
        read_events_stream(spark, src_dir),
        table,
        view,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    assert matview_is_fresh(view, table)
    want = {
        (r["event_type"], r["n"], round(r["total"], 6))
        for r in spark.read.parquet(src_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    got = {
        (r["event_type"], r["n"], round(r["total"], 6))
        for r in view.load().collect()
    }
    assert got == want
