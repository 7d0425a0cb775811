"""Streaming sink into GraftTable: transactional micro-batch appends.

``foreachBatch`` is the idiomatic Spark bridge from a streaming query to a
custom transactional sink: each micro-batch arrives as a regular
DataFrame, and the GraftTable commit protocol (atomic rename of one JSON
log entry) makes the append all-or-nothing — the same exactly-once-per-
batch story Delta's streaming sink offers. Batch ids are recorded in the
commit parameters, so a restarted query can skip an already-committed
batch (idempotent replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from delta_lake_optimizations_spark.table import GraftTable


class GraftStreamWriter:
    """foreachBatch handler appending each micro-batch to a GraftTable."""

    def __init__(self, table: GraftTable):
        self.table = table

    def _committed_batches(self) -> set[int]:
        out = set()
        for c in self.table.commits():
            b = c.operation_parameters.get("streamingBatchId")
            if b is not None:
                out.add(int(b))
        return out

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.table.exists() and batch_id in self._committed_batches():
            return  # replayed batch after restart — already committed
        mode = "append" if self.table.exists() else "overwrite"
        self.table.write(
            batch_df, mode=mode, extra_parameters={"streamingBatchId": int(batch_id)}
        )


def write_stream_to_graft(
    stream_df: DataFrame,
    table: GraftTable,
    checkpoint_dir: str,
    query_name: str = "graft_sink",
) -> StreamingQuery:
    """Start an availableNow streaming append into ``table``."""
    return (
        stream_df.writeStream.foreachBatch(GraftStreamWriter(table))
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
