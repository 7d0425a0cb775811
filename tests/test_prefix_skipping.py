"""LIKE-prefix file skipping + single-column string clustering:
``skip_where=[("col", "like_prefix", p)]`` must prune files via the
[p, succ(p)) range over min/max stats, and a single-column OPTIMIZE
cluster key must produce a pure range layout (tight string min/max per
file) instead of the multi-column hash-bucket path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table import GraftTable, optimize
from delta_lake_optimizations_spark.table.graft_table import _prefix_succ


def test_prefix_succ():
    assert _prefix_succ("abc") == "abd"
    assert _prefix_succ("a\U0010ffff") == "b"
    assert _prefix_succ("\U0010ffff") is None
    assert _prefix_succ("z") == "{"


def _string_table(spark, path) -> GraftTable:
    df = spark.range(4000).select(
        F.col("id"),
        F.concat(
            F.element_at(
                F.array(*[F.lit(c) for c in "abcdefgh"]),
                (F.col("id") % 8 + 1).cast("int"),
            ),
            F.lit("key-"),
            F.col("id").cast("string"),
        ).alias("k"),
    )
    t = GraftTable(spark, str(path))
    t.write(df.repartition(8), properties={"graft.cluster.by": "k"})
    optimize(t, target_files=8)  # range-clusters on k (single-column path)
    return t


def test_single_column_cluster_gives_tight_string_ranges(spark, tmp_path):
    t = _string_table(spark, tmp_path / "t")
    snap = t.snapshot()
    assert len(snap.files) == 8
    # range layout: per-file [min, max] spans are DISJOINT (the defining
    # property repartitionByRange guarantees and the hash-bucket path
    # destroys for strings)
    spans = sorted(
        (f.stats["minValues"]["k"], f.stats["maxValues"]["k"]) for f in snap.files
    )
    for (_, prev_max), (nxt_min, _) in zip(spans, spans[1:]):
        assert prev_max <= nxt_min, spans


def test_like_prefix_probe_prunes_and_is_exact(spark, tmp_path):
    t = _string_table(spark, tmp_path / "t")
    total = len(t.snapshot().files)

    scanned = t.files_scanned(skip_where=[("k", "like_prefix", "c")])
    assert scanned < total, f"prefix probe read {scanned}/{total} files"

    got = t.load(skip_where=[("k", "like_prefix", "ckey-1")]).select("k").collect()
    want = (
        t.load()
        .filter(F.col("k").startswith("ckey-1"))
        .select("k")
        .collect()
    )
    assert sorted(r["k"] for r in got) == sorted(r["k"] for r in want)
    assert len(want) > 0

    # absent prefix: provably no file holds it
    assert t.files_scanned(skip_where=[("k", "like_prefix", "zzz")]) == 0


def test_like_prefix_on_partition_column(spark, tmp_path):
    df = spark.range(200).select(
        "id",
        F.concat(F.lit("grp"), (F.col("id") % 4).cast("string")).alias("g"),
    )
    t = GraftTable(spark, str(tmp_path / "p"))
    t.write(df, partition_by=["g"])
    total = len(t.snapshot().files)
    pruned = t.files_scanned(skip_where=[("g", "like_prefix", "grp1")])
    assert pruned < total
    got = t.load(skip_where=[("g", "like_prefix", "grp1")]).count()
    assert got == 50
