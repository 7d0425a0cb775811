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
