"""Incremental materialized views: refresh equals full recompute after
appends, updates-via-delete, group disappearance; no-op when fresh."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table import (
    GraftTable,
    create_matview,
    delete,
    matview_is_fresh,
    refresh_matview,
)


def _rows(df, keys):
    return {tuple(r[k] for k in keys): r.asDict() for r in df.collect()}


def _source(spark, path) -> GraftTable:
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 30.0), ("c", 4, 5.0)],
        ["grp", "id", "val"],
    )
    t = GraftTable(spark, path)
    t.write(df)
    return t


AGGS = {"n": ["count"], "total": ["sum", "val"], "hi": ["max", "val"]}


def _expected(t: GraftTable):
    return (
        t.load()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("total"),
            F.max("val").alias("hi"),
        )
    )


def test_create_and_freshness(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])
    assert matview_is_fresh(view, src)
    assert refresh_matview(view, src) is None  # no source movement -> no-op


def test_refresh_after_append_touches_new_and_old_groups(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    src.write(
        spark.createDataFrame([("a", 5, 1.0), ("d", 6, 60.0)], ["grp", "id", "val"]),
        mode="append",
    )
    assert not matview_is_fresh(view, src)
    assert refresh_matview(view, src) is not None
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])
    assert matview_is_fresh(view, src)


def test_refresh_after_delete_maintains_min_max(spark, tmp_path):
    """MAX under deletes is the case additive delta maintenance cannot
    handle — partial recompute must get it right."""
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    delete(src, "val = 20.0")  # removes group a's max
    refresh_matview(view, src)
    got = _rows(view.load(), ["grp"])
    assert got[("a",)]["hi"] == 10.0 and got[("a",)]["n"] == 1
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])


def test_refresh_drops_vanished_groups(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    delete(src, "grp = 'c'")
    refresh_matview(view, src)
    got = _rows(view.load(), ["grp"])
    assert ("c",) not in got
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])


def test_multi_refresh_chain(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    for batch in (
        [("b", 10, 7.0)],
        [("e", 11, 1.5), ("e", 12, 2.5)],
    ):
        src.write(spark.createDataFrame(batch, ["grp", "id", "val"]), mode="append")
        refresh_matview(view, src)
        assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])
    delete(src, "grp = 'e'")
    refresh_matview(view, src)
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])


def test_refresh_maintains_null_group_key(spark, tmp_path):
    """ADVICE r02 (low): equality joins never match NULL keys, so a NULL
    GROUP BY group materialized at create time was never refreshed. All
    matview key comparisons are now null-safe (<=>)."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), (None, 2, 20.0), (None, 3, 30.0)],
        "grp string, id bigint, val double",
    )
    src = GraftTable(spark, str(tmp_path / "src"))
    src.write(df)
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])

    # append into the NULL group: refresh must update it
    src.write(
        spark.createDataFrame([(None, 4, 40.0)], "grp string, id bigint, val double"),
        mode="append",
    )
    refresh_matview(view, src)
    got = _rows(view.load(), ["grp"])
    assert got == _rows(_expected(src), ["grp"])
    assert got[(None,)]["n"] == 3 and got[(None,)]["total"] == 90.0

    # delete every NULL-group row: refresh must drop the NULL group
    delete(src, "grp IS NULL")
    refresh_matview(view, src)
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])
    assert (None,) not in _rows(view.load(), ["grp"])
