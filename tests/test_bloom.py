"""Bloom-sidecar file skipping: builds are incremental, probes are
Python-side (zero Spark jobs), and pruning is exact-result-preserving."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table.bloom import (
    BLOOM_COLUMNS_PROP,
    bloom_build,
    indexed_files,
)
from delta_lake_optimizations_spark.table.graft_table import GraftTable


def _hash_spread_table(spark, path, n=4000, files=8) -> GraftTable:
    """Every file's id range spans ~the whole domain (hash repartition),
    so min/max skipping prunes nothing — the bloom's worst-case rival."""
    df = spark.range(n).select(
        F.col("id"), F.concat(F.lit("key_"), F.col("id")).alias("k")
    ).repartition(files, "id")
    t = GraftTable(spark, path)
    t.write(df)
    return t

def test_bloom_prunes_point_lookup_minmax_cannot(spark, tmp_path):
    t = _hash_spread_table(spark, str(tmp_path / "t"))
    probe = [("k", "=", "key_1234")]
    before = t.files_scanned(skip_where=probe)
    assert before == 8, "hash layout should defeat min/max skipping"
    built = bloom_build(t, ["k"], fpp=0.001)
    assert built == {"k": 8}
    after = t.files_scanned(skip_where=probe)
    assert after == 1  # the one file that truly holds key_1234
    rows = t.load(skip_where=probe).collect()
    assert len(rows) == 1 and rows[0]["id"] == 1234


def test_bloom_absent_value_scans_no_files(spark, tmp_path):
    t = _hash_spread_table(spark, str(tmp_path / "t"))
    bloom_build(t, ["k"], fpp=0.001)
    assert t.files_scanned(skip_where=[("k", "=", "key_999999")]) == 0
    assert t.load(skip_where=[("k", "=", "key_999999")]).count() == 0


def test_bloom_integer_column_and_fp_rate(spark, tmp_path):
    t = _hash_spread_table(spark, str(tmp_path / "t"))
    bloom_build(t, ["id"], fpp=0.001)
    # every present value must hit its own file (no false negatives)
    for v in (0, 17, 1234, 3999):
        assert t.files_scanned(skip_where=[("id", "=", v)]) >= 1
        assert t.load(skip_where=[("id", "=", v)]).count() == 1
    # absent probes: 8 files x fpp 0.001 -> expected ~0 false-positive scans
    scanned = sum(
        t.files_scanned(skip_where=[("id", "=", v)]) for v in range(10_000, 10_050)
    )
    assert scanned <= 4, f"false-positive file scans too high: {scanned}"


def test_bloom_is_incremental_and_unindexed_files_scan(spark, tmp_path):
    t = _hash_spread_table(spark, str(tmp_path / "t"))
    bloom_build(t, ["k"], fpp=0.001)
    # a post-build append is unindexed -> conservatively scanned
    extra = spark.range(100_000, 100_002).select(
        F.col("id"), F.concat(F.lit("key_"), F.col("id")).alias("k")
    ).coalesce(1)
    t.write(extra, mode="append")
    probe = [("k", "=", "key_100000")]
    assert t.files_scanned(skip_where=probe) == 1  # just the new file
    assert t.load(skip_where=probe).count() == 1
    # second build indexes only the missing file
    n_before = len(indexed_files(t, "k"))
    assert bloom_build(t, ["k"], fpp=0.001) == {"k": 1}
    assert len(indexed_files(t, "k")) == n_before + 1
    assert t.files_scanned(skip_where=[("k", "=", "key_999999")]) == 0


def test_bloom_autobuild_via_table_property(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("u_"), F.col("id")).alias("k")
    ).repartition(4, "id")
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(df, properties={BLOOM_COLUMNS_PROP: "k"})
    assert len(indexed_files(t, "k")) == 4
    assert t.files_scanned(skip_where=[("k", "=", "u_77")]) == 1
    # appends keep auto-indexing (property persists in table metadata)
    t.write(
        spark.range(5000, 5002).select(
            F.col("id"), F.concat(F.lit("u_"), F.col("id")).alias("k")
        ).coalesce(1),
        mode="append",
    )
    assert len(indexed_files(t, "k")) == 5
    assert t.files_scanned(skip_where=[("k", "=", "u_5001")]) == 1


def test_vacuum_prunes_stale_bloom_entries(spark, tmp_path):
    from delta_lake_optimizations_spark.table.maintenance import optimize, vacuum

    t = _hash_spread_table(spark, str(tmp_path / "t"))
    bloom_build(t, ["k"], fpp=0.001)
    assert len(indexed_files(t, "k")) == 8
    optimize(t, target_files=2)  # tombstones the 8 original files
    vacuum(t, retain_hours=0)  # deletes them for good
    left = indexed_files(t, "k")
    assert len(left) == 0  # only the vacuumed files were indexed
    # rebuild covers the compacted files; skipping works again
    bloom_build(t, ["k"], fpp=0.001)
    assert len(indexed_files(t, "k")) == 2
    assert t.files_scanned(skip_where=[("k", "=", "key_999999")]) == 0
    assert t.load(skip_where=[("k", "=", "key_1234")]).count() == 1


def test_bloom_all_null_file_skipped(spark, tmp_path):
    t = GraftTable(spark, str(tmp_path / "t"))
    some = spark.range(10).select(F.col("id"), F.lit("x").alias("k")).coalesce(1)
    nulls = spark.range(10, 20).select(
        F.col("id"), F.lit(None).cast("string").alias("k")
    ).coalesce(1)
    t.write(some)
    t.write(nulls, mode="append")
    bloom_build(t, ["k"])
    assert t.files_scanned(skip_where=[("k", "=", "x")]) == 1


def test_bloom_probe_type_coercion_no_false_negatives(spark, tmp_path):
    """ADVICE r02 (medium): probe-side str(value) diverged from Spark's
    CAST(col AS STRING) for cross-typed probes. The fix coerces the probe
    to the column's dtype (recorded in the sidecar) and refuses to prune
    when equivalence can't be guaranteed — false negatives are the failure
    mode that silently LOSES rows."""
    t = _hash_spread_table(spark, str(tmp_path / "t"))
    bloom_build(t, ["id"], fpp=0.001)
    # float probe with integral value against a bigint column: 1234.0 == 1234
    assert t.files_scanned(skip_where=[("id", "=", 1234.0)]) >= 1
    assert t.load(skip_where=[("id", "=", 1234.0)]).count() == 1
    # fractional float probe: equivalence can't be normalized -> must NOT
    # prune below what min/max skipping allows (conservative full pass)
    assert t.files_scanned(skip_where=[("id", "=", 1234.5)]) == 8


def test_bloom_refuses_float_columns(spark, tmp_path):
    """Double/float/timestamp columns are refused at build time: Spark's
    CAST string form ('1.0E-7') differs from Python's ('1e-07'), which
    would poison probes with false negatives."""
    import pytest

    df = spark.range(100).select(
        F.col("id"), (F.col("id") / 7.0).alias("x")
    )
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(df)
    with pytest.raises(ValueError, match="support only"):
        bloom_build(t, ["x"])


def test_bloom_boolean_and_date_columns(spark, tmp_path):
    """Booleans ('true'/'false') and dates (yyyy-MM-dd) have stable
    Spark<->Python string forms — supported and correct both ways."""
    import datetime

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 2 == 0).alias("flag"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 400).cast("int")).alias("d"),
    ).repartition(4, "id")
    t = GraftTable(spark, str(tmp_path / "t"))
    t.write(df)
    bloom_build(t, ["flag", "d"])
    assert t.load(skip_where=[("flag", "=", True)]).count() == 500
    probe_day = datetime.date(2024, 1, 11)
    want = t.load().filter(F.col("d") == F.lit(probe_day)).count()
    got = t.load(skip_where=[("d", "=", probe_day)]).count()
    assert got == want and want > 0
    # absent date prunes everything
    assert t.files_scanned(skip_where=[("d", "=", datetime.date(1999, 1, 1))]) == 0


def test_bloom_time_travel_after_dv_delete_no_false_negative(spark, tmp_path):
    """ADVICE r02 (low): sidecars are built from RAW file contents
    (deletion vectors ignored), so a time-travel read at a version where a
    later-DV'd row was still live is never wrongly pruned."""
    from delta_lake_optimizations_spark.table.maintenance import delete

    t = _hash_spread_table(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    # merge-on-read delete marks rows in DVs without rewriting files
    delete(t, 'k = "key_1234"', deletion_vectors=True)
    bloom_build(t, ["k"], fpp=0.001)  # built AFTER the DV exists
    probe = [("k", "=", "key_1234")]
    # current version: row is deleted (DV applied at read)
    assert t.load(skip_where=probe).count() == 0
    # time travel to v0: the row must still be findable through the bloom
    rows = t.load(version=v0, skip_where=probe).collect()
    assert len(rows) == 1 and rows[0]["id"] == 1234


def test_in_list_skipping_and_bloom(spark, tmp_path):
    """IN-list predicates prune via min/max stats AND bloom sidecars: a
    list of absent keys drops every file; a list containing one present
    key keeps only that key's true span."""
    import os as _os

    from delta_lake_optimizations_spark.table import GraftTable
    from delta_lake_optimizations_spark.table.bloom import bloom_build

    t = GraftTable(spark, _os.path.join(tmp_path, "inl"))
    df = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    t.write(df.repartition(8))
    bloom_build(t, ["k"])
    n_files = len(t.snapshot().files)
    assert t.files_scanned(skip_where=[("k", "in", [-5, -6])]) == 0
    kept = t.files_scanned(skip_where=[("k", "in", [3, -5])])
    assert 1 <= kept < n_files
    assert t.load(skip_where=[("k", "in", [3, 500, -1])]).count() == 2
