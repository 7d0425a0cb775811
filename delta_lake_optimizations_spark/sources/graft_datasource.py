"""A PySpark Python Data Source (SPARK-44076, PySpark >= 4.0) exposing
GraftTable as a first-class Spark connector::

    register_graft_source(spark)
    df = spark.read.format("graft").option("path", tbl).load()        # batch
    df = spark.read.format("graft").option("versionAsOf", 3).load(tbl)
    st = spark.readStream.format("graft").load(tbl)                   # stream

Why a connector and not just ``GraftTable.load``: the connector gives the
table an *executor-side* scan path with file-granular input partitions —
on a 1000-executor cluster each add-file is read by pyarrow directly on
the executor that owns the split, with no driver fan-out of file lists
beyond the partition plan, and Arrow RecordBatches flow zero-copy into
Tungsten rows. It also unlocks Structured Streaming over the commit log:
each microbatch serves exactly the add-files of newly landed commits
(offset = committed version), which is how Delta's own streaming source
works (reference teaches the table-as-stream idea implicitly via its
append/history lessons, docs/02-lab-optimizations.md "Table History").

Scale notes (100 TB):
- ``partitions()`` is O(#files in the delta of versions), driver-side
  metadata only; row data never touches the driver.
- ``read()`` streams one parquet file per input partition in bounded
  Arrow batches (64k rows) — executor memory is independent of file
  count and table size.
- The commit log is tiny JSON; replay cost is bounded by the checkpoint
  interval (graft_table._write_checkpoint), not by table age.

Streaming change-commit policy mirrors Delta's options:
- default: a commit that removes files (OPTIMIZE/DELETE/UPDATE/overwrite)
  fails the stream — appends-only is the only exactly-once-safe default;
- ``skipChangeCommits=true``: such commits are skipped entirely;
- ``ignoreChanges=true``: their *added* files are emitted (may duplicate
  rows rewritten by OPTIMIZE — documented Delta semantics).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.pandas.types import to_arrow_schema


@dataclass
class GraftFilePartition(InputPartition):
    """One input split == one add-file. Picklable; carries everything the
    executor needs so ``read()`` never re-opens the commit log."""

    abs_path: str
    partition_values: tuple[tuple[str, str], ...]  # hive col -> string value


def _snapshot(path: str, version: int | None = None, timestamp: str | None = None):
    """Driver-side log replay without a SparkSession: GraftTable's log
    primitives are pure-Python file IO (graft_table.py:_replay), so a
    metadata-only handle with spark=None is safe."""
    from delta_lake_optimizations_spark.table.graft_table import GraftTable

    tbl = GraftTable(None, path)  # type: ignore[arg-type]
    return tbl, tbl.snapshot(version=version, timestamp=timestamp)


def _parse_partition_value(raw: str, dtype: T.DataType):
    """Hive directory values are strings; cast to the schema's type."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(raw)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(raw)
    if isinstance(dtype, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dtype, T.DateType):
        from datetime import date

        return date.fromisoformat(raw)
    return raw


def _read_file_as_batches(
    abs_path: str,
    partition_values: dict[str, str],
    schema: T.StructType,
    batch_rows: int = 65536,
) -> Iterator[pa.RecordBatch]:
    """Executor-side scan of one parquet file, emitted as Arrow batches
    matching the table schema exactly (order, names, types). Partition
    columns absent from the file are materialized as constants from the
    hive directory values. Column pruning: only the schema's non-partition
    fields are read from disk."""
    arrow_schema = to_arrow_schema(schema)
    present = set(pq.read_schema(abs_path).names)
    # Only columns that exist in THIS file are read; columns added later
    # by merge_schema evolution null-fill (Delta read-side evolution).
    file_cols = [
        f.name for f in schema.fields if f.name not in partition_values and f.name in present
    ]
    table = pq.read_table(abs_path, columns=file_cols)
    n = table.num_rows
    cols = []
    for field, arrow_field in zip(schema.fields, arrow_schema):
        if field.name in partition_values:
            val = _parse_partition_value(partition_values[field.name], field.dataType)
            cols.append(pa.array([val] * n, type=arrow_field.type))
        elif field.name not in present:
            cols.append(pa.nulls(n, type=arrow_field.type))
        else:
            col = table.column(field.name)
            if col.type != arrow_field.type:
                col = col.cast(arrow_field.type)
            cols.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    out = pa.Table.from_arrays(
        [c if isinstance(c, (pa.Array, pa.ChunkedArray)) else c for c in cols],
        schema=arrow_schema,
    )
    for batch in out.to_batches(max_chunksize=batch_rows):
        yield batch


class GraftBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._options = options

    def partitions(self) -> list[InputPartition]:
        path = _required_path(self._options)
        version = self._options.get("versionasof")
        timestamp = self._options.get("timestampasof")
        _, snap = _snapshot(
            path,
            version=int(version) if version is not None else None,
            timestamp=timestamp,
        )
        return [
            GraftFilePartition(
                abs_path=os.path.join(path, f.path),
                partition_values=tuple(sorted(f.partition_values.items())),
            )
            for f in snap.files
        ]

    def read(self, partition: GraftFilePartition) -> Iterator[pa.RecordBatch]:
        yield from _read_file_as_batches(
            partition.abs_path, dict(partition.partition_values), self._schema
        )


class GraftStreamReader(DataSourceStreamReader):
    """Offset = highest fully-committed table version served so far."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._options = options
        self._path = _required_path(options)
        self._skip_change = _bool_opt(options, "skipchangecommits")
        self._ignore_changes = _bool_opt(options, "ignorechanges")

    def initialOffset(self) -> dict:
        starting = self._options.get("startingversion")
        if starting is not None and str(starting).lower() == "latest":
            tbl, _ = _snapshot(self._path)
            return {"version": tbl.latest_version()}
        start = int(starting) if starting is not None else 0
        return {"version": start - 1}

    def latestOffset(self) -> dict:
        tbl, _ = _snapshot(self._path)
        return {"version": tbl.latest_version()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from delta_lake_optimizations_spark.table.graft_table import GraftTable

        tbl = GraftTable(None, self._path)  # type: ignore[arg-type]
        out: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            commit = tbl._read_commit(v)
            # Appends add files; metadata-only commits (TBLPROPERTIES,
            # constraints) touch nothing; anything that REMOVES files
            # (overwrite, OPTIMIZE, DELETE, UPDATE, MERGE, RESTORE) is a
            # change commit — serving its adds would duplicate or lose rows.
            if commit.remove:
                if self._skip_change:
                    continue
                if not self._ignore_changes:
                    raise ValueError(
                        f"graft stream hit non-append commit v{v} "
                        f"({commit.operation}); set skipChangeCommits=true to "
                        "skip rewrites or ignoreChanges=true to emit their "
                        "added files (may duplicate rewritten rows)"
                    )
            out.extend(
                GraftFilePartition(
                    abs_path=os.path.join(self._path, f.path),
                    partition_values=tuple(sorted(f.partition_values.items())),
                )
                for f in commit.add
            )
        return out

    def read(self, partition: GraftFilePartition) -> Iterator[pa.RecordBatch]:
        yield from _read_file_as_batches(
            partition.abs_path, dict(partition.partition_values), self._schema
        )

    def commit(self, end: dict) -> None:  # offsets live in the query checkpoint
        pass


class GraftDataSource(DataSource):
    """``spark.read.format("graft")`` / ``spark.readStream.format("graft")``."""

    @classmethod
    def name(cls) -> str:
        return "graft"

    def schema(self) -> T.StructType:
        path = _required_path(self.options)
        version = self.options.get("versionasof")
        timestamp = self.options.get("timestampasof")
        _, snap = _snapshot(
            path,
            version=int(version) if version is not None else None,
            timestamp=timestamp,
        )
        if snap.schema is None:
            raise ValueError(f"GraftTable at {path} has no schema in its log")
        # Parquet scans surface every column as nullable; mirror that so a
        # graft-source frame is schema-identical to GraftTable.load.
        return T.StructType(
            [T.StructField(f.name, f.dataType, True, f.metadata) for f in snap.schema.fields]
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return GraftBatchReader(schema, dict(self.options))

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return GraftStreamReader(schema, dict(self.options))


def _required_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("graft source requires .option('path', ...) or .load(path)")
    return os.path.abspath(path)


def _bool_opt(options: dict, key: str) -> bool:
    return str(options.get(key, "false")).lower() == "true"


def register_graft_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the 'graft' format."""
    spark.dataSource.register(GraftDataSource)


__all__ = ["GraftDataSource", "register_graft_source"]
