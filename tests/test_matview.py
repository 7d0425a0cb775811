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


SUMS = {"n": ["count"], "total": ["sum", "val"]}


def _last_params(t: GraftTable) -> dict:
    """Parameters of the most recent refresh MERGE (skipping the
    set_properties bookkeeping commit that follows it)."""
    import json as _json

    for r in t.history().collect():
        p = _json.loads(r["operationParameters"])
        if "matviewRefresh" in p:
            return p
    return {}


def test_additive_fast_path_on_append_only_count_sum(spark, tmp_path):
    """Append-only count/sum views take the additive path: the refresh
    aggregates ONLY the appended files (numIncrementFiles pins it) and the
    result still equals a full recompute."""
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], SUMS)

    inc = spark.createDataFrame(
        [("a", 9, 1.5), ("d", 10, 7.0)], "grp string, id bigint, val double"
    ).coalesce(1)
    src.write(inc, mode="append")
    n_new_files = len(src._read_commit(src.latest_version()).add)

    refresh_matview(view, src)
    params = _last_params(view)
    assert params.get("matviewStrategy") == "additive"
    assert params.get("numIncrementFiles") == n_new_files

    want = {
        r["grp"]: (r["n"], r["total"])
        for r in src.load().groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("total")
        ).collect()
    }
    got = {r["grp"]: (r["n"], r["total"]) for r in view.load().collect()}
    assert got == want


def test_additive_fast_path_chains_and_handles_null_groups(spark, tmp_path):
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], SUMS)
    for batch in ([(None, 20, 2.0)], [("a", 21, 3.0), (None, 22, 4.0)]):
        src.write(
            spark.createDataFrame(batch, "grp string, id bigint, val double"),
            mode="append",
        )
        refresh_matview(view, src)
        assert _last_params(view).get("matviewStrategy") == "additive"
    got = {r["grp"]: (r["n"], r["total"]) for r in view.load().collect()}
    assert got[None] == (2, 6.0)
    assert got["a"] == (3, 33.0)


def test_additive_fast_path_falls_back_on_delete_and_min_max(spark, tmp_path):
    """A remove in the version range (delete) or a non-additive aggregate
    (max) must fall back to partial recompute and stay correct."""
    # min/max view: appends alone must NOT use the additive path
    src = _source(spark, str(tmp_path / "src"))
    view = create_matview(spark, src, str(tmp_path / "mv"), ["grp"], AGGS)
    src.write(
        spark.createDataFrame([("a", 30, 99.0)], "grp string, id bigint, val double"),
        mode="append",
    )
    refresh_matview(view, src)
    assert _last_params(view).get("matviewStrategy") != "additive"
    assert _rows(view.load(), ["grp"]) == _rows(_expected(src), ["grp"])

    # count/sum view, but the range contains a DELETE -> partial recompute
    src2 = _source(spark, str(tmp_path / "src2"))
    view2 = create_matview(spark, src2, str(tmp_path / "mv2"), ["grp"], SUMS)
    delete(src2, "id = 1")
    src2.write(
        spark.createDataFrame([("b", 31, 1.0)], "grp string, id bigint, val double"),
        mode="append",
    )
    refresh_matview(view2, src2)
    assert _last_params(view2).get("matviewStrategy") != "additive"
    want = {
        r["grp"]: (r["n"], r["total"])
        for r in src2.load().groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("total")
        ).collect()
    }
    got = {r["grp"]: (r["n"], r["total"]) for r in view2.load().collect()}
    assert got == want
