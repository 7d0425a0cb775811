"""CLONE and version-diff (change-feed) utilities over GraftTable.

- ``clone``: Delta-style table clone. Shallow = the new table's first
  commit REFERENCES the source's current data files (zero data copied,
  instant); deep = files are copied. Shallow clones share Delta's
  documented caveat: VACUUM on the source can break the clone.
- ``diff_versions``: row-level changes between two versions, computed as
  a distributed multiset diff (``exceptAll`` both ways) — correct for
  every operation mix (a pure OPTIMIZE diff is empty even though every
  file changed, because the ROWS are identical).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table.graft_table import (
    AddFile,
    GraftTable,
)


def clone(
    source: GraftTable,
    dest_path: str,
    shallow: bool = True,
    version: int | None = None,
) -> GraftTable:
    """Clone ``source`` (optionally at a historical ``version``) to
    ``dest_path``. Returns the new table handle."""
    spark = source.spark
    snap = source.snapshot(version=version)
    dest = GraftTable(spark, dest_path)
    if dest.exists():
        raise FileExistsError(f"table already exists at {dest_path}")

    metadata = {
        "schemaJson": snap.schema_json,
        "partitionColumns": snap.partition_columns,
        "properties": dict(snap.properties),
    }
    adds: list[AddFile] = []
    if shallow:
        for f in snap.files:
            # reference the source's file by absolute path — os.path.join
            # in the read path passes absolute components through
            adds.append(
                AddFile(
                    path=os.path.join(source.path, f.path),
                    size=f.size,
                    num_records=f.num_records,
                    partition_values=dict(f.partition_values),
                    stats=dict(f.stats),
                    # DV dir referenced absolutely too; the read join key
                    # is relocation-proof (last two path components)
                    dv_path=os.path.join(source.path, f.dv_path) if f.dv_path else None,
                    dv_count=f.dv_count,
                )
            )
    else:
        rel_dir = dest._new_data_dir(0)
        copied_dvs: dict[str, str] = {}
        for f in snap.files:
            # Preserve the source-relative structure (unique, so no
            # collisions): the DV join key is the last two path
            # components, which this keeps intact.
            rel_target = os.path.join(rel_dir, f.path)
            abs_target = os.path.join(dest.path, rel_target)
            os.makedirs(os.path.dirname(abs_target), exist_ok=True)
            shutil.copy2(os.path.join(source.path, f.path), abs_target)
            dv_target = None
            if f.dv_path:
                if f.dv_path not in copied_dvs:
                    dv_rel = os.path.join(rel_dir, f.dv_path)
                    shutil.copytree(
                        os.path.join(source.path, f.dv_path),
                        os.path.join(dest.path, dv_rel),
                    )
                    copied_dvs[f.dv_path] = dv_rel
                dv_target = copied_dvs[f.dv_path]
            adds.append(
                AddFile(
                    path=rel_target,
                    size=f.size,
                    num_records=f.num_records,
                    partition_values=dict(f.partition_values),
                    stats=dict(f.stats),
                    dv_path=dv_target,
                    dv_count=f.dv_count,
                )
            )
    dest._write_commit(
        "CLONE",
        {
            "source": source.path,
            "sourceVersion": snap.version,
            "shallow": shallow,
        },
        adds,
        [],
        metadata,
    )
    return dest


def diff_versions(table: GraftTable, from_version: int, to_version: int | None = None) -> DataFrame:
    """Row-level change feed between two versions: one output row per
    inserted/deleted row (an update appears as delete + insert), tagged
    ``_change_type``.

    Two plans, picked from the COMMIT LOG (driver-side metadata, no jobs):

    - **append-only fast path**: every commit in the range added files
      without removing any (and without attaching deletion vectors) —
      the change feed is exactly the new files' rows, read directly and
      tagged ``insert``. O(increment) I/O, zero shuffles; this is what
      makes downstream incremental consumers (matview refresh, streaming
      backfill) cost ∝ changed data at 100 TB.
    - **general path**: multiset ``exceptAll`` of the two snapshots (one
      shuffle per side) — correct for arbitrary delete/update/rewrite
      histories.
    """
    to_v = to_version if to_version is not None else table.latest_version()
    commits = [table._read_commit(v) for v in range(from_version + 1, to_v + 1)]
    append_only = all(
        not c.remove and not any(a.dv_path for a in c.add) for c in commits
    )
    if append_only:
        snap = table.snapshot(version=to_v)
        old_paths = {f.path for f in table.snapshot(version=from_version).files}
        new_files = [f for f in snap.files if f.path not in old_paths]
        return table._read_files(snap, new_files).withColumn(
            "_change_type", F.lit("insert")
        )
    old = table.load(version=from_version)
    new = table.load(version=to_v)
    inserts = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
    deletes = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
    return inserts.unionByName(deletes)
