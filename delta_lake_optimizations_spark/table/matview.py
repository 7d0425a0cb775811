"""Incrementally maintained materialized aggregate views over GraftTable.

A materialized view is itself a GraftTable holding ``GROUP BY`` results,
plus bookkeeping properties (source path, materialized source version,
group/agg spec). ``refresh`` brings it up to date by **partial
recompute**: the row-level change feed between the materialized and the
current source version (``clone.diff_versions``) names the affected
group keys; only those groups are re-aggregated (semi-join pushdown into
the source scan) and merged into the view — groups that vanished are
deleted. Refresh cost is therefore proportional to the CHANGED data and
the affected groups, never to table size: the 100 TB contract where a
daily increment touches a handful of partitions.

Refresh picks between two strategies:

- **Additive fast path** (pure count/sum views over an APPEND-ONLY
  version range): aggregate ONLY the files added since the materialized
  version and merge ``+delta`` into the view — O(increment) reads, the
  streaming-ingest shape. Safe because appends can't shrink any group
  and count/sum compose under union. MIN/MAX/AVG views, or any range
  containing a remove (delete/update/optimize rewrites change visible
  rows), fall through to:
- **Partial recompute** (correct for ALL aggregate kinds): the
  row-level change feed names the affected group keys; only those
  groups are re-aggregated (semi-join pushdown into the source scan)
  and merged; vanished groups are deleted.

Either way refresh cost is proportional to the CHANGED data, never to
table size: the 100 TB contract where a daily increment touches a
handful of partitions.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table.clone import diff_versions
from delta_lake_optimizations_spark.table.graft_table import Commit, GraftTable
from delta_lake_optimizations_spark.table.merge import merge

_PROP_SOURCE = "matview.sourcePath"
_PROP_VERSION = "matview.sourceVersion"
_PROP_GROUP = "matview.groupBy"
_PROP_AGGS = "matview.aggs"

#: agg kind -> needs a value column
_KINDS = {"count": False, "sum": True, "min": True, "max": True, "avg": True}


def _agg_exprs(aggs: dict[str, list[str]]) -> list[Column]:
    out: list[Column] = []
    for name, spec in aggs.items():
        kind = spec[0]
        if kind not in _KINDS:
            raise ValueError(f"unsupported aggregate kind {kind!r} for {name!r}")
        if _KINDS[kind] and len(spec) != 2:
            raise ValueError(f"{kind} needs a value column: {name!r}")
        if kind == "count":
            out.append(F.count(F.lit(1)).alias(name))
        else:
            out.append(getattr(F, kind)(F.col(spec[1])).alias(name))
    return out


def _aggregate(df: DataFrame, group_by: list[str], aggs: dict[str, list[str]]) -> DataFrame:
    return df.groupBy(*group_by).agg(*_agg_exprs(aggs))


def create_matview(
    spark: SparkSession,
    source: GraftTable,
    view_path: str,
    group_by: list[str],
    aggs: dict[str, list[str]],
) -> GraftTable:
    """Full initial materialization. ``aggs`` maps output column →
    ``["count"]`` or ``["sum"|"min"|"max"|"avg", value_col]``."""
    snap = source.snapshot()
    df = _aggregate(source.load(version=snap.version), group_by, aggs)
    view = GraftTable(spark, view_path)
    view.write(
        df,
        properties={
            _PROP_SOURCE: source.path,
            _PROP_VERSION: str(snap.version),
            _PROP_GROUP: json.dumps(group_by),
            _PROP_AGGS: json.dumps(aggs),
        },
    )
    return view


def _additive_fast_path_applies(
    source: GraftTable, from_v: int, cur_v: int, aggs: dict[str, list[str]]
) -> bool:
    """True iff every aggregate is additive (count/sum) and every commit
    in ``(from_v, cur_v]`` is a pure append — no removed files, no
    deletion vectors on the added files (a DV delete re-adds files with
    tombstones, which shrinks groups)."""
    if not all(spec[0] in ("count", "sum") for spec in aggs.values()):
        return False
    for v in range(from_v + 1, cur_v + 1):
        c = source._read_commit(v)
        if c.remove:
            return False
        if any(a.dv_path for a in c.add):
            return False
    return True


def _refresh_additive(
    view: GraftTable,
    source: GraftTable,
    from_v: int,
    cur_v: int,
    group_by: list[str],
    aggs: dict[str, list[str]],
) -> Commit:
    """Append-only count/sum maintenance: aggregate ONLY the newly added
    files' rows and merge ``existing (+) delta`` per group — reads the
    increment, never the historical data. NULL-safe sum combination:
    SUM is NULL only when both sides are NULL."""
    snap = source.snapshot(version=cur_v)
    old_paths = {f.path for f in source.snapshot(version=from_v).files}
    new_files = [f for f in snap.files if f.path not in old_paths]
    delta = _aggregate(source._read_files(snap, new_files), group_by, aggs)

    upd: dict[str, Any] = {}
    for name, spec in aggs.items():
        if spec[0] == "count":
            upd[name] = F.col(name) + F.col(f"s_{name}")
        else:  # sum: t (+) s with SQL NULL semantics (NULL iff both NULL)
            upd[name] = F.coalesce(
                F.col(name) + F.col(f"s_{name}"), F.col(name), F.col(f"s_{name}")
            )
    return merge(
        view,
        delta,
        on=group_by,
        when_matched_update=upd,
        when_not_matched_insert="*",
        null_safe_keys=True,
        extra_parameters={
            "matviewRefresh": f"{from_v}->{cur_v}",
            "matviewStrategy": "additive",
            "numIncrementFiles": len(new_files),
        },
    )


def refresh_matview(view: GraftTable, source: GraftTable | None = None) -> Commit | None:
    """Incremental refresh; returns the view's new commit, or None when
    the source hasn't moved. Append-only count/sum views take the
    additive fast path (reads only the increment); everything else does
    partial recompute: CDF names affected group keys → re-aggregate ONLY
    those groups (semi join prunes the source scan) → upsert into the
    view → delete groups that no longer exist."""
    props = view.snapshot().properties
    group_by = json.loads(props[_PROP_GROUP])
    aggs: dict[str, list[str]] = json.loads(props[_PROP_AGGS])
    if source is None:
        source = GraftTable(view.spark, props[_PROP_SOURCE])
    from_v = int(props[_PROP_VERSION])
    cur_v = source.latest_version()
    if cur_v == from_v:
        return None

    if _additive_fast_path_applies(source, from_v, cur_v, aggs):
        commit = _refresh_additive(view, source, from_v, cur_v, group_by, aggs)
        view.set_properties({_PROP_VERSION: str(cur_v)})
        return commit

    cdf = diff_versions(source, from_version=from_v, to_version=cur_v)
    affected = cdf.select(*group_by).distinct()
    # All group-key comparisons below are NULL-SAFE (<=>): a NULL GROUP BY
    # key is a legitimate group that plain ``=`` joins would silently skip,
    # leaving the view stale for that group forever.
    aff = affected.select(*[F.col(c).alias(f"__g_{c}") for c in group_by])
    semi_cond = [F.col(c).eqNullSafe(F.col(f"__g_{c}")) for c in group_by]
    fresh = _aggregate(
        source.load(version=cur_v).join(aff, semi_cond, "left_semi"),
        group_by,
        aggs,
    )
    commit = merge(
        view,
        fresh,
        on=group_by,
        when_matched_update="*",
        when_not_matched_insert="*",
        null_safe_keys=True,
        extra_parameters={"matviewRefresh": f"{from_v}->{cur_v}"},
    )
    # groups present in the change feed but absent from the re-aggregate
    # lost their last row — remove them from the view
    fr = fresh.select(*[F.col(c).alias(f"__g_{c}") for c in group_by])
    gone = affected.join(fr, semi_cond, "left_anti")
    if gone.limit(1).count() > 0:
        commit = merge(
            view,
            gone,
            on=group_by,
            when_matched_update=None,
            when_not_matched_insert=None,
            when_matched_delete=True,
            null_safe_keys=True,
            extra_parameters={"matviewRefresh": f"{from_v}->{cur_v} (gone groups)"},
        )
    view.set_properties({_PROP_VERSION: str(cur_v)})
    return commit


def matview_is_fresh(view: GraftTable, source: GraftTable | None = None) -> bool:
    props = view.snapshot().properties
    if source is None:
        source = GraftTable(view.spark, props[_PROP_SOURCE])
    return int(props[_PROP_VERSION]) == source.latest_version()


def matview_spec(view: GraftTable) -> dict[str, Any]:
    """The view's bookkeeping (source, materialized version, spec)."""
    props = view.snapshot().properties
    return {
        "source_path": props[_PROP_SOURCE],
        "source_version": int(props[_PROP_VERSION]),
        "group_by": json.loads(props[_PROP_GROUP]),
        "aggs": json.loads(props[_PROP_AGGS]),
    }
