"""Automated table statistics + CBO feed (reference T1-T3, SURVEY §2.5).

The reference teaches Fabric's automated-statistics pipeline
(docs/02-lab-optimizations.md:587-785): row counts, per-column min/max,
null counts, distinct counts, and column lengths for the first 32 columns,
collected automatically at write time, stored in a lightweight sidecar, and
injected into Spark's cost-based optimizer ("~45% faster joins/filters/
aggregations", ``:592-593``). It also documents a ``StatisticsStore``
management API (``removeStatisticsData`` / ``recomputeStatisticsWithCompaction``,
``:684-687``) that is non-functional in Fabric (``:690-695``) — ours works.

Two stat tiers, mirroring the reference's architecture:

- **per-file min/max/nullCount** — harvested free from parquet footers at
  every commit (``graft_table.collect_file_stats``) and used for
  driver-side file skipping (T1 + the Delta-style pruning of SURVEY §4);
- **per-table column stats** (this module) — one Spark aggregation job,
  persisted as a JSON sidecar under ``_log/stats/``, and injectable into
  Spark's CBO via ``ANALYZE TABLE`` on a catalog-registered snapshot (T2)
  so joins get accurate row estimates and broadcast decisions.

Scale: the collection job is a single map-side-combinable aggregation
(min/max/count/approx_count_distinct/length) — one pass, no join, no
global sort; the sidecar is O(columns) bytes, driver-side.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_optimizations_spark.table.graft_table import (
    STATS_MAX_COLUMNS,
    GraftTable,
)

_STATS_DIR = "_log/stats"

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERABLE_EXTRA = (T.StringType, T.DateType, T.TimestampType, T.BooleanType)


def column_stats(df: DataFrame, max_columns: int = STATS_MAX_COLUMNS) -> dict[str, Any]:
    """A5 / T1: per-column stats in ONE aggregation pass.

    Mirrors the reference's stat set (docs/02-lab-optimizations.md:591,
    767-769): rowCount; per column distinctCount, min, max, nullCount,
    avgLen, maxLen — first ``max_columns`` columns only (the reference's
    own 32-column cap keeps the job bounded on wide tables).
    """
    fields = df.schema.fields[:max_columns]
    aggs = [F.count(F.lit(1)).alias("__rowCount")]
    for f in fields:
        c, dt = f.name, f.dataType
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"{c}__nullCount"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinctCount"))
        if isinstance(dt, _NUMERIC + _ORDERABLE_EXTRA):
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
        if isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(c)).alias(f"{c}__avgLen"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__maxLen"))
    row = df.agg(*aggs).collect()[0].asDict()

    def _plain(v: Any) -> Any:
        if v is None or isinstance(v, (int, float, str, bool)):
            return v
        return str(v)

    out: dict[str, Any] = {"rowCount": row["__rowCount"], "columns": {}}
    for f in fields:
        c = f.name
        col: dict[str, Any] = {
            "dataType": f.dataType.simpleString(),
            "nullCount": row.get(f"{c}__nullCount"),
            "distinctCount": row.get(f"{c}__distinctCount"),
        }
        for k in ("min", "max", "avgLen", "maxLen"):
            if f"{c}__{k}" in row:
                col[k] = _plain(row[f"{c}__{k}"])
        out["columns"][c] = col
    return out


class StatisticsStore:
    """The reference's statistics management API (``:684-687``), functional.

    Sidecar layout: ``<table>/_log/stats/v{version:011d}.json`` — one stats
    document per table version that had stats computed.
    """

    def __init__(self, table: GraftTable):
        self.table = table

    def _dir(self) -> str:
        return os.path.join(self.table.path, _STATS_DIR)

    def _path(self, version: int) -> str:
        return os.path.join(self._dir(), f"v{version:011d}.json")

    def collect(self) -> dict[str, Any]:
        """T1: compute + persist column stats for the current snapshot."""
        snap = self.table.snapshot()
        stats = column_stats(self.table.load())
        stats["version"] = snap.version
        os.makedirs(self._dir(), exist_ok=True)
        tmp = self._path(snap.version) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(stats, fh)
        os.rename(tmp, self._path(snap.version))
        return stats

    def get(self) -> dict[str, Any] | None:
        """Latest persisted stats at or before the current version."""
        if not os.path.isdir(self._dir()):
            return None
        cur = self.table.snapshot().version
        best = None
        for fn in sorted(os.listdir(self._dir())):
            if fn.startswith("v") and fn.endswith(".json"):
                v = int(fn[1:-5])
                if v <= cur:
                    best = fn
        if best is None:
            return None
        with open(os.path.join(self._dir(), best)) as fh:
            return json.load(fh)

    def remove(self) -> int:
        """``StatisticsStore.removeStatisticsData`` (reference ``:684``):
        drop all persisted stats documents; returns how many were removed."""
        if not os.path.isdir(self._dir()):
            return 0
        n = 0
        for fn in os.listdir(self._dir()):
            if fn.endswith(".json"):
                os.remove(os.path.join(self._dir(), fn))
                n += 1
        return n

    def recompute(self, compact: bool = False, target_file_mb: int | None = None) -> dict[str, Any]:
        """``recomputeStatisticsWithCompaction`` (reference ``:685``):
        optionally OPTIMIZE first, then recollect stats."""
        if compact:
            from delta_lake_optimizations_spark.table.maintenance import optimize

            kwargs = {"target_file_mb": target_file_mb} if target_file_mb else {}
            optimize(self.table, **kwargs)
        return self.collect()


def inject_cbo_stats(spark: SparkSession, name: str, table: GraftTable) -> None:
    """T2: feed the table's current snapshot to Spark's cost-based optimizer.

    ``ANALYZE TABLE`` needs a catalog (non-temp) table, and a catalog
    parquet table needs a single directory — which every GraftTable commit
    produces (each commit writes into its own ``data/vNNN-*/`` dir). After
    OPTIMIZE or a fresh write the snapshot is exactly one directory, so the
    common workshop flow (write → optimize → analyze, reference
    ``:605-610``) always works; multi-dir snapshots (post-append) raise
    with a pointer to ``optimize()``.
    """
    snap = table.snapshot()
    commit_dirs = set()
    for f in snap.files:
        rel = f.path.split(os.sep)
        commit_dirs.add(os.path.join(table.path, rel[0], rel[1]))
    if len(commit_dirs) != 1:
        raise ValueError(
            f"snapshot spans {len(commit_dirs)} data directories; run optimize() "
            "first so the snapshot is one directory, then inject_cbo_stats()"
        )
    location = commit_dirs.pop()
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.catalog.createTable(name, path=location, source="parquet")
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")


def plan_stats(df: DataFrame) -> dict[str, Any]:
    """Reference ``:767-769``: inspect the optimized plan's Statistics —
    sizeInBytes and (with CBO stats) rowCount estimates."""
    jstats = df._jdf.queryExecution().optimizedPlan().stats()
    out: dict[str, Any] = {"sizeInBytes": int(jstats.sizeInBytes())}
    row_count = jstats.rowCount()
    out["rowCount"] = int(row_count.get()) if row_count.isDefined() else None
    return out
