"""Columnar checkpoint + vectorized prune (table/checkpoint_arrow.py).

The contract under test (VERDICT r10 #1): the arrow-backed snapshot path
must be BEHAVIOR-IDENTICAL to the per-row path it replaces — exact
AddFile roundtrip, replay equality against the dict-based replay, and
prune verdicts equal to ``_file_may_match`` on every same-typed input
(hypothesis-pinned), falling back conservatively (keep) where one arrow
type can't represent a column.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delta_lake_optimizations_spark.table import checkpoint_arrow as ca
from delta_lake_optimizations_spark.table.graft_table import (
    AddFile,
    Commit,
    GraftTable,
    _file_may_match,
)


def _af(i, *, pv=None, stats=None, dv=None, nrec=1000):
    return AddFile(
        path=f"data/p-{i:06d}.parquet",
        size=1 << 20,
        num_records=nrec,
        partition_values=pv or {},
        stats=stats or {},
        dv_path=dv,
        dv_count=7 if dv else 0,
    )


def test_exact_addfile_roundtrip():
    files = [
        _af(0, stats={"minValues": {"id": 0, "s": "a"},
                      "maxValues": {"id": 9, "s": "z"},
                      "nullCounts": {"id": 0, "s": 3}}),
        _af(1, pv={"country": "US"}, dv="data/dv-1.parquet"),
        # poisoned stats column (explicit None) and empty stats both
        # roundtrip verbatim via statsJson
        _af(2, stats={"minValues": {"id": None}, "maxValues": {"id": None},
                      "nullCounts": {}}),
        _af(3),
        _af(4, pv={"country": "DE", "day": "2026-01-01"}),
    ]
    back = ca.addfiles_from_arrow(ca.arrow_from_addfiles(files))
    assert [f.__dict__ for f in back] == [f.__dict__ for f in files]


def test_apply_tail_matches_dict_replay():
    base_files = [_af(i, stats={"minValues": {"id": i}, "maxValues": {"id": i},
                                "nullCounts": {"id": 0}}) for i in range(20)]
    base = ca.arrow_from_addfiles(base_files)

    def commit(adds, removes):
        return Commit(0, 0, "X", {}, None, adds, removes)

    # remove, re-add with NEW stats (upsert), add fresh, remove-then-readd
    tail = [
        commit([_af(3, stats={"minValues": {"id": 300},
                              "maxValues": {"id": 300},
                              "nullCounts": {"id": 0}})],
               [base_files[5].path]),
        commit([_af(5), _af(30, pv={"country": "FR"})],
               [base_files[7].path, base_files[3].path]),
    ]
    got = ca.addfiles_from_arrow(ca.apply_tail(base, tail))

    files = {f.path: f for f in base_files}
    for c in tail:
        for r in c.remove:
            files.pop(r, None)
        for a in c.add:
            files[a.path] = a
    want = sorted(files.values(), key=lambda a: a.path)
    assert [f.__dict__ for f in got] == [f.__dict__ for f in want]


def test_apply_tail_unifies_new_stats_columns():
    """Tail adds carrying stats/partition columns the base never saw
    (schema evolution) must concat cleanly; base rows read null there."""
    base = ca.arrow_from_addfiles(
        [_af(0, stats={"minValues": {"id": 1}, "maxValues": {"id": 2},
                       "nullCounts": {"id": 0}})]
    )
    tail = [Commit(0, 0, "X", {}, None,
                   [_af(1, stats={"minValues": {"price": 0.5},
                                  "maxValues": {"price": 1.5},
                                  "nullCounts": {"price": 0}},
                        pv={"day": "d1"})], [])]
    out = ca.apply_tail(base, tail)
    assert out.num_rows == 2
    assert "smin:price" in out.column_names and "pv:day" in out.column_names
    back = ca.addfiles_from_arrow(out)
    assert back[0].stats["minValues"] == {"id": 1}
    assert back[1].partition_values == {"day": "d1"}


# ---------------------------------------------------------------------------
# Vectorized prune == per-file prune (hypothesis)
# ---------------------------------------------------------------------------

_int_stat = st.one_of(st.none(), st.integers(-50, 50))
_str_stat = st.one_of(st.none(), st.text("abcd", min_size=0, max_size=3))


@st.composite
def _corpus(draw):
    n = draw(st.integers(1, 12))
    files = []
    for i in range(n):
        lo = draw(_int_stat)
        hi = draw(_int_stat)
        if lo is not None and hi is not None and lo > hi:
            lo, hi = hi, lo
        smn = draw(_str_stat)
        smx = draw(_str_stat)
        if smn is not None and smx is not None and smn > smx:
            smn, smx = smx, smn
        nc = draw(st.one_of(st.none(), st.integers(0, 1000)))
        pv = draw(st.one_of(st.none(), st.sampled_from(["1", "7", "x"])))
        stats = {"minValues": {}, "maxValues": {}, "nullCounts": {}}
        if draw(st.booleans()):
            stats["minValues"]["id"] = lo
            stats["maxValues"]["id"] = hi
        if draw(st.booleans()):
            stats["minValues"]["s"] = smn
            stats["maxValues"]["s"] = smx
        if nc is not None:
            stats["nullCounts"]["id"] = nc
        files.append(_af(i, pv={"k": pv} if pv is not None else {},
                         stats=stats))
    return files


_pred = st.one_of(
    st.tuples(st.just("id"), st.sampled_from(["=", "<", "<=", ">", ">="]),
              st.integers(-60, 60)),
    st.tuples(st.just("s"), st.sampled_from(["=", "<", ">", "like_prefix"]),
              st.text("abcd", min_size=0, max_size=2)),
    st.tuples(st.just("id"), st.just("in"),
              st.lists(st.integers(-60, 60), min_size=1, max_size=5)),
    st.tuples(st.just("id"), st.sampled_from(["isnull", "notnull"]),
              st.none()),
    st.tuples(st.just("k"), st.sampled_from(["=", "<", ">="]),
              st.integers(0, 9)),
    st.tuples(st.just("k"), st.just("in"),
              st.lists(st.integers(0, 9), min_size=1, max_size=3)),
)


@settings(max_examples=300, deadline=None)
@given(files=_corpus(), preds=st.lists(_pred, min_size=1, max_size=3))
def test_prune_arrow_matches_file_may_match(files, preds):
    parts = ["k"]
    tbl = ca.arrow_from_addfiles(files)
    got = {f.path for f in
           ca.addfiles_from_arrow(ca.prune_arrow(tbl, preds, parts))}
    want = {f.path for f in files if _file_may_match(f, preds, parts)}
    assert got == want


def test_prune_mixed_type_stats_falls_back_conservatively():
    """A stats column that is int in one file and string in another has
    no single arrow type: the accelerator is omitted and predicates on
    it keep every file (the per-file path may prune more — divergence is
    allowed ONLY in the keep direction; load() re-filters exactly)."""
    files = [
        _af(0, stats={"minValues": {"z": 1}, "maxValues": {"z": 5},
                      "nullCounts": {}}),
        _af(1, stats={"minValues": {"z": "a"}, "maxValues": {"z": "b"},
                      "nullCounts": {}}),
    ]
    tbl = ca.arrow_from_addfiles(files)
    assert "smin:z" not in tbl.column_names
    pruned = ca.prune_arrow(tbl, [("z", "=", 100)], [])
    assert pruned.num_rows == 2  # keeps all — strictly conservative
    # exact roundtrip is untouched by the omitted accelerator
    back = ca.addfiles_from_arrow(tbl)
    assert back[1].stats["minValues"] == {"z": "a"}


# ---------------------------------------------------------------------------
# GraftTable integration: format migration + vacuum
# ---------------------------------------------------------------------------


def test_legacy_json_checkpoint_still_read_and_migrated(spark, tmp_path):
    """Tables checkpointed by rounds <= 10 carry _checkpoint.<v>.json;
    they must load as-is, and the NEXT checkpoint written comes out
    parquet (one-time row-wise migration)."""
    t = GraftTable(spark, str(tmp_path / "legacy"))
    t.write(spark.range(50).selectExpr("id", "id * 2 AS v"))
    for i in range(12):  # crosses the interval -> checkpoint at v10
        t.write(spark.range(5).selectExpr("id", "id * 2 AS v"), mode="append")
    cps = t._checkpoint_versions()
    assert cps, "expected a checkpoint"
    # rewrite the newest checkpoint in the legacy JSON shape
    v = cps[-1]
    snap = t._replay(v, from_version=None)
    doc = {
        "version": v,
        "files": [f.to_json() for f in snap.files],
        "schemaJson": snap.schema_json,
        "partitionColumns": snap.partition_columns,
        "properties": snap.properties,
    }
    os.remove(t._checkpoint_path_pq(v))
    with open(t._checkpoint_path(v), "w") as fh:
        json.dump(doc, fh)

    t2 = GraftTable(spark, str(tmp_path / "legacy"))
    assert t2.count_rows() == 50 + 12 * 5
    assert t2.snapshot().files_arrow is None  # legacy path: row-wise
    # ... and the next interval's checkpoint migrates to parquet
    for i in range(10):
        t2.write(spark.range(3).selectExpr("id", "id * 2 AS v"), mode="append")
    newest = t2._checkpoint_versions()[-1]
    assert os.path.exists(t2._checkpoint_path_pq(newest))
    t3 = GraftTable(spark, str(tmp_path / "legacy"))
    assert t3.snapshot().files_arrow is not None
    assert t3.count_rows() == 50 + 12 * 5 + 30


def test_vacuum_log_removes_parquet_checkpoints(spark, tmp_path):
    from delta_lake_optimizations_spark.table.maintenance import vacuum_log

    t = GraftTable(spark, str(tmp_path / "vl"))
    t.write(spark.range(10).selectExpr("id", "id AS v"))
    for _ in range(25):
        t.write(spark.range(2).selectExpr("id", "id AS v"), mode="append")
    cps = t._checkpoint_versions()
    assert len(cps) >= 2
    res = vacuum_log(t, keep_versions=5)
    assert res["removed_checkpoints"] >= 1
    assert not os.path.exists(t._checkpoint_path_pq(cps[0]))
    # table still loads from the surviving checkpoint
    t2 = GraftTable(spark, str(tmp_path / "vl"))
    assert t2.count_rows() == 10 + 50


def test_partitioned_table_columnar_prune(spark, tmp_path):
    """Hive partition pruning through the vectorized path: snapshot is
    arrow-backed after a checkpoint and files_scanned matches per-file."""
    t = GraftTable(spark, str(tmp_path / "part"))
    df = spark.range(200).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS bucket"
    )
    t.write(df, partition_by=["bucket"])
    for _ in range(10):  # force a checkpoint
        t.write(
            spark.range(20).selectExpr(
                "id", "CAST(id % 4 AS STRING) AS bucket"
            ),
            mode="append",
            partition_by=["bucket"],
        )
    t2 = GraftTable(spark, str(tmp_path / "part"))
    snap = t2.snapshot()
    assert snap.files_arrow is not None
    n_all = t2.files_scanned()
    n_one = t2.files_scanned(skip_where=[("bucket", "=", "2")])
    assert 0 < n_one < n_all
    legacy = [
        f for f in snap.files
        if _file_may_match(f, [("bucket", "=", "2")], ["bucket"])
    ]
    assert n_one == len(legacy)
    got = sorted(
        r["id"] for r in
        t2.load(skip_where=[("bucket", "=", "2")]).collect()
    )
    assert got == sorted(
        [i for i in range(200) if i % 4 == 2]
        + [i for i in range(20) if i % 4 == 2] * 10
    )
