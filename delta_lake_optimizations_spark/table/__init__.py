"""GraftTable: versioned Parquet tables with Delta-style maintenance.

Public API::

    from delta_lake_optimizations_spark.table import GraftTable, optimize, ...

    t = GraftTable(spark, "/path/to/table")
    t.write(df)                               # S2/S3: commit 0
    t.write(df2, mode="append")               # WRITE append
    t.load()                                  # current snapshot
    t.load(version=0)                         # M7 time travel
    t.load(timestamp="2026-08-13T00:00:00")   # M8
    t.history(); t.detail(); t.describe_extended()  # M6/M12/M11
    optimize(t, zorder_by=["l_shipdate"], vorder=True)   # M1/M2/M3
    delete(t, "l_quantity > 49")              # M9
    restore(t, 0)                             # M10
    vacuum(t, retain_hours=0, dry_run=True)   # M4/M5
"""

from delta_lake_optimizations_spark.table.graft_table import (
    AddFile,
    Commit,
    GraftTable,
    Snapshot,
    collect_file_stats,
)
from delta_lake_optimizations_spark.table.maintenance import (
    delete,
    fsck_repair,
    generate_manifest,
    optimize,
    reorg_purge,
    restore,
    update,
    vacuum,
    vacuum_log,
)
from delta_lake_optimizations_spark.table.matview import (
    create_matview,
    matview_is_fresh,
    refresh_matview,
)
from delta_lake_optimizations_spark.table.convert import convert_to_graft
from delta_lake_optimizations_spark.table.merge import merge

__all__ = [
    "AddFile",
    "Commit",
    "GraftTable",
    "Snapshot",
    "collect_file_stats",
    "convert_to_graft",
    "create_matview",
    "delete",
    "fsck_repair",
    "matview_is_fresh",
    "merge",
    "optimize",
    "refresh_matview",
    "generate_manifest",
    "reorg_purge",
    "restore",
    "update",
    "vacuum",
    "vacuum_log",
]
