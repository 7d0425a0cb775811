"""Identity columns (Delta GENERATED { ALWAYS | BY DEFAULT } AS IDENTITY
parity): distributed allocation is unique and monotonic within a write, the
high-water mark is transactional (survives restarts via the log, advances
past explicit BY DEFAULT values), and ALWAYS rejects supplied values.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table import GraftTable
from delta_lake_optimizations_spark.table.graft_table import ConstraintViolationError


def _ids(t):
    return [r["id"] for r in t.load().select("id").collect()]


def test_identity_always_allocates_unique_monotonic(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    df = spark.range(1000).select(F.col("id").alias("k")).repartition(8)
    t.write(df, properties={"graft.identity.id": "start=1,step=1"})
    ids = _ids(t)
    assert len(ids) == 1000
    assert len(set(ids)) == 1000, "identity values must be unique"
    assert min(ids) == 1, "allocation starts at declared start"
    # gaps allowed; but the range is bounded by the allocation count
    assert max(ids) == 1000, "contiguous within a single write's prefix sums"


def test_identity_append_continues_from_high_water_mark(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    t.write(
        spark.range(10).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=100,step=5"},
    )
    first = set(_ids(t))
    assert min(first) == 100 and len(first) == 10
    t.write(spark.range(10).select(F.col("id").alias("k")), mode="append")
    second = set(_ids(t)) - first
    assert len(second) == 10
    assert min(second) > max(first), "appends continue past the high-water mark"
    assert all((v - 100) % 5 == 0 for v in second), "step respected"


def test_identity_always_rejects_supplied_values(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    t.write(
        spark.range(5).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=1,step=1"},
    )
    bad = spark.range(3).select(F.col("id").alias("k"), F.lit(7).cast("long").alias("id"))
    with pytest.raises(ConstraintViolationError, match="GENERATED ALWAYS"):
        t.write(bad.select("k", "id"), mode="append")


def test_identity_by_default_syncs_high_water_mark(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    t.write(
        spark.range(5).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=1,step=1,always=false"},
    )
    # explicit values far above the allocated range
    explicit = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") + 1000).cast("long").alias("id")
    )
    t.write(explicit.select("k", "id"), mode="append")
    # next allocation must land past the explicit max, never colliding
    t.write(spark.range(4).select(F.col("id").alias("k")), mode="append")
    ids = _ids(t)
    assert len(ids) == 12
    assert len(set(ids)) == 12, "no collisions after explicit values"
    assert max(ids) >= 1002 + 4


def test_identity_survives_overwrite_monotonic(spark, tmp_path):
    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    t.write(
        spark.range(10).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=1,step=1"},
    )
    before = max(_ids(t))
    t.write(spark.range(3).select(F.col("id").alias("k")), mode="overwrite")
    after = _ids(t)
    assert min(after) > before, "high-water mark is monotonic across overwrite"


def test_concurrent_identity_appends_never_double_allocate(spark, tmp_path):
    """Two writers allocating identity values from the same snapshot:
    exactly one commits; the loser gets ConcurrentCommitError (identity
    appends carry metadata, so they are never blind-rebased — a rebase
    would duplicate the allocated range). Retrying from a fresh snapshot
    succeeds with non-overlapping values."""
    from delta_lake_optimizations_spark.table.graft_table import (
        ConcurrentCommitError,
    )

    t = GraftTable(spark, os.path.join(tmp_path, "race"))
    t.write(
        spark.range(5).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=1,step=1"},
    )

    # simulate the race deterministically: both writers read the same
    # snapshot version, writer A commits first, writer B's commit (built
    # against the stale base) must abort
    stale_base = t.latest_version()
    df = spark.range(3).select(F.col("id").alias("k"))

    t.write(df, mode="append")  # writer A wins
    # writer B: force the stale base by committing at base_version + 1
    stale = GraftTable(spark, t.path)
    import delta_lake_optimizations_spark.table.graft_table as gt

    orig = gt.GraftTable._write_commit

    def stale_commit(
        self, operation, parameters, add, remove, metadata=None,
        base_version=None, no_rebase=False,
    ):
        return orig(
            self, operation, parameters, add, remove, metadata,
            base_version=stale_base, no_rebase=no_rebase,
        )

    try:
        gt.GraftTable._write_commit = stale_commit
        with pytest.raises(ConcurrentCommitError):
            stale.write(df, mode="append")
    finally:
        gt.GraftTable._write_commit = orig

    # retry from a fresh snapshot: values continue past A's allocation
    t.write(df, mode="append")
    ids = [r["id"] for r in t.load().select("id").collect()]
    assert len(ids) == 11 and len(set(ids)) == 11, "no double allocation"


def test_truncate_allowed_on_always_identity_table(spark, tmp_path):
    """Regression (ADVICE r03): an empty overwrite (TRUNCATE TABLE) on an
    existing GENERATED ALWAYS table supplies no values and must pass; the
    high-water mark survives so post-truncate appends stay monotonic."""
    t = GraftTable(spark, os.path.join(tmp_path, "trunc"))
    t.write(
        spark.range(10).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=1,step=1"},
    )
    high = max(_ids(t))
    snap = t.snapshot()
    empty = spark.createDataFrame([], snap.schema)
    t.write(empty, mode="overwrite")
    assert t.load().count() == 0
    t.write(spark.range(3).select(F.col("id").alias("k")), mode="append")
    assert min(_ids(t)) > high, "allocation continues past pre-truncate mark"


def test_failed_write_unpersists_pinned_identity_frames(spark, tmp_path):
    """Regression (ADVICE r03): identity allocation persists frames; a
    pre-write validation failure (append schema mismatch) must still
    release them instead of leaking cache for the session."""
    t = GraftTable(spark, os.path.join(tmp_path, "leak"))
    t.write(
        spark.range(5).select(F.col("id").alias("k")),
        properties={"graft.identity.id": "start=1,step=1"},
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    bad = spark.range(3).select(F.col("id").cast("string").alias("k"))  # type mismatch
    with pytest.raises(ValueError, match="schema mismatch"):
        t.write(bad, mode="append")
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before, f"pinned frames leaked: {before} -> {after}"
