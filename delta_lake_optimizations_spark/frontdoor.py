"""SQL front door: the reference's ``%%sql`` entry style (Entry 2, SURVEY §3).

Vanilla Spark 4 over plain Parquet cannot parse the Delta maintenance verbs
the reference workshop teaches (``OPTIMIZE``, ``VACUUM``, ``DESCRIBE
HISTORY``, ``VERSION AS OF`` — reference docs/02-lab-optimizations.md:
118-121,205-211,220-225,306-308). ``GraftCatalog.sql`` intercepts those
statements with a small regex router BEFORE ``spark.sql`` and dispatches to
the native implementations in :mod:`delta_lake_optimizations_spark.table`;
everything else passes through verbatim, so Catalyst still owns ordinary
queries.

Scale note: routing is a handful of driver-side regex matches per
statement — no data touched until the dispatched verb runs its Spark job.

Usage::

    cat = GraftCatalog(spark)
    cat.create("sales", df, "/warehouse/sales")
    cat.sql("OPTIMIZE sales ZORDER BY (country, category)")
    cat.sql("SELECT COUNT(*) FROM sales VERSION AS OF 0")
    cat.sql("DELETE FROM sales WHERE status = 'cancelled'")
    cat.sql("DESCRIBE HISTORY sales")
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from delta_lake_optimizations_spark.table import (
    GraftTable,
    delete,
    merge,
    optimize,
    restore,
    update,
    vacuum,
)

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"', "`"):
        return s[1:-1]
    return s


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas not inside parens or quotes (SET a=1, b=f(x, y))."""
    out, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p for p in (x.strip() for x in out) if p]


class GraftCatalog:
    """Name -> GraftTable registry plus the SQL dispatcher.

    Mirrors the reference's catalog surface: tables addressed by name
    (``sales``) or created from a location (``CREATE TABLE ... USING DELTA
    LOCATION``, reference docs/02-lab-optimizations.md:367-371 → our
    :meth:`register`).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, GraftTable] = {}
        self._result_cache: dict[tuple, DataFrame] = {}

    # -- registration ------------------------------------------------------

    def create(
        self,
        name: str,
        df: DataFrame,
        path: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> GraftTable:
        """CREATE TABLE AS SELECT: write ``df`` as a GraftTable and register."""
        t = GraftTable(self.spark, path)
        t.write(df, mode=mode, partition_by=partition_by)
        self._tables[name] = t
        self._refresh(name)
        return t

    def register(self, name: str, path: str) -> GraftTable:
        """CREATE TABLE ... LOCATION: attach an existing table by path."""
        t = GraftTable(self.spark, path)
        if not t.exists():
            raise FileNotFoundError(f"no GraftTable at {path}")
        self._tables[name] = t
        self._refresh(name)
        return t

    def table(self, name: str) -> GraftTable:
        if name not in self._tables:
            raise KeyError(f"unknown graft table: {name!r} (have {sorted(self._tables)})")
        return self._tables[name]

    def _refresh(self, name: str) -> None:
        """Re-point the temp view at the table's current snapshot."""
        self._tables[name].load().createOrReplaceTempView(name)

    # -- the dispatcher ----------------------------------------------------

    def cached_sql(self, text: str) -> DataFrame:
        """Snapshot-consistent RESULT CACHE: the statement's result is
        persisted and keyed on (statement, version of every referenced
        registered table). A repeat of the same statement against
        unchanged tables returns the persisted frame — zero recompute;
        the moment any referenced table commits a new version the key
        changes, the stale entry is unpersisted, and the query recomputes.
        Versioned tables make result caching SAFE: validity is a pure
        metadata check (log versions), never a data comparison — the same
        trick Delta-aware BI caches use. Non-SELECT statements (DML,
        maintenance) should go through :meth:`sql` directly."""
        stmt = text.strip().rstrip(";").strip()
        referenced = tuple(
            (name, t.latest_version())
            for name, t in sorted(self._tables.items())
            if re.search(rf"\b{re.escape(name)}\b", stmt)
        )
        key = (stmt, referenced)
        hit = self._result_cache.get(key)
        if hit is not None:
            return hit
        # drop stale entries for this statement (older versions)
        for k in [k for k in self._result_cache if k[0] == stmt]:
            self._result_cache.pop(k).unpersist()
        df = self.sql(stmt).persist()
        df.count()  # materialize now so every consumer hits the cache
        self._result_cache[key] = df
        return df

    def sql(self, text: str) -> DataFrame:
        stmt = text.strip().rstrip(";").strip()

        for pattern, handler in self._ROUTES:
            m = pattern.match(stmt)
            if m:
                return handler(self, m)

        # Time-travel clause inside an ordinary query: rewrite
        # "<table> VERSION AS OF n" / "<table> TIMESTAMP AS OF 'ts'" to a
        # snapshot temp view, then hand the query to Catalyst.
        rewritten = self._rewrite_time_travel(
            self._rewrite_table_changes(self._rewrite_graft_files(stmt))
        )
        return self.spark.sql(rewritten)

    def _rewrite_table_changes(self, stmt: str) -> str:
        """Delta's ``table_changes('t', from[, to])`` CDF table function:
        rewritten to a temp view over the version-diff change feed (clone
        module), so it composes with any surrounding SELECT."""

        def sub(m: re.Match) -> str:
            name = _unquote(m.group("name"))
            if name not in self._tables:
                return m.group(0)
            from delta_lake_optimizations_spark.table.clone import diff_versions

            from_v = int(m.group("fromv"))
            to_v = int(m.group("tov")) if m.group("tov") else None
            view = f"__cdf_{name}_{from_v}_{to_v if to_v is not None else 'latest'}"
            diff_versions(self._tables[name], from_v, to_v).createOrReplaceTempView(view)
            return view

        return re.sub(
            r"table_changes\s*\(\s*(?P<name>'[^']*'|\"[^\"]*\"|\w+)\s*,"
            r"\s*(?P<fromv>\d+)\s*(?:,\s*(?P<tov>\d+)\s*)?\)",
            sub,
            stmt,
            flags=re.I,
        )

    def _rewrite_graft_files(self, stmt: str) -> str:
        """``graft_files('t')`` metadata table function (Iceberg's
        ``t.files`` shape): the current snapshot's file inventory —
        path, size, rows, live rows, partition values, has_dv — as a
        queryable view. Pure log metadata, no data I/O."""

        def sub(m: re.Match) -> str:
            name = _unquote(m.group("name"))
            if name not in self._tables:
                return m.group(0)
            t = self._tables[name]
            snap = t.snapshot()
            rows = [
                (
                    f.path,
                    f.size,
                    f.num_records,
                    f.live_records,
                    str(dict(sorted(f.partition_values.items()))),
                    f.dv_path is not None,
                )
                for f in snap.files
            ]
            schema = T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("size_bytes", T.LongType()),
                    T.StructField("num_records", T.LongType()),
                    T.StructField("live_records", T.LongType()),
                    T.StructField("partition_values", T.StringType()),
                    T.StructField("has_deletion_vector", T.BooleanType()),
                ]
            )
            view = f"__files_{name}_v{snap.version}"
            self.spark.createDataFrame(rows, schema).createOrReplaceTempView(view)
            return view

        return re.sub(
            r"graft_files\s*\(\s*(?P<name>'[^']*'|\"[^\"]*\"|\w+)\s*\)",
            sub,
            stmt,
            flags=re.I,
        )

    def _rewrite_time_travel(self, stmt: str) -> str:
        def sub_version(m: re.Match) -> str:
            name, version = m.group(1), int(m.group(2))
            if name not in self._tables:
                return m.group(0)
            view = f"__tt_{name}_v{version}"
            self._tables[name].load(version=version).createOrReplaceTempView(view)
            return view

        def sub_timestamp(m: re.Match) -> str:
            name, ts = m.group(1), _unquote(m.group(2))
            if name not in self._tables:
                return m.group(0)
            view = f"__tt_{name}_t{re.sub(r'[^0-9]', '', ts)}"
            self._tables[name].load(timestamp=ts).createOrReplaceTempView(view)
            return view

        stmt = re.sub(
            rf"({_IDENT})\s+VERSION\s+AS\s+OF\s+(\d+)", sub_version, stmt, flags=re.I
        )
        stmt = re.sub(
            rf"({_IDENT})\s+TIMESTAMP\s+AS\s+OF\s+('[^']*'|\"[^\"]*\")",
            sub_timestamp,
            stmt,
            flags=re.I,
        )
        return stmt

    # -- verb handlers -----------------------------------------------------

    def _h_optimize(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        zorder = m.group("zorder")
        vorder = m.group("vorder") is not None
        zcols = [c.strip().strip("`") for c in zorder.split(",")] if zorder else None
        where = None
        if m.group("where"):
            where = {}
            for kv in re.finditer(
                r"([\w`]+)\s*=\s*('[^']*'|\"[^\"]*\"|[\w.]+)", m.group("where")
            ):
                where[kv.group(1).strip("`")] = _unquote(kv.group(2))
        t = self.table(name)
        commit = optimize(t, zorder_by=zcols, vorder=vorder, where=where)
        self._refresh(name)
        return self._row(
            ("table", "version", "operation", "numFilesAdded", "numFilesRemoved"),
            (name, commit.version, "OPTIMIZE", len(commit.add), len(commit.remove)),
        )

    def _h_vacuum(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        hours = m.group("hours")
        dry = m.group("dry") is not None
        t = self.table(name)
        kwargs = {"dry_run": dry}
        if hours is not None:
            kwargs["retain_hours"] = float(hours)
        removed = vacuum(t, **kwargs)
        schema = T.StructType([T.StructField("path", T.StringType())])
        return self.spark.createDataFrame([(p,) for p in removed], schema)

    def _h_history(self, m: re.Match) -> DataFrame:
        return self.table(m.group("table")).history()

    def _h_detail(self, m: re.Match) -> DataFrame:
        return self.table(m.group("table")).detail()

    def _h_extended(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        if name in self._tables:
            return self._tables[name].describe_extended()
        return self.spark.sql(m.group(0))  # not ours — let Spark describe it

    def _h_delete(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        commit = delete(self.table(name), m.group("pred"))
        self._refresh(name)
        n = commit.operation_parameters.get("numRemovedFiles", 0)
        return self._row(("table", "version", "numFilesRewritten"), (name, commit.version, n))

    def _h_restore(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        t = self.table(name)
        gd = m.groupdict()
        if gd.get("version") is not None:
            version = int(gd["version"])
        else:
            # TIMESTAMP AS OF: resolve to the last version committed at or
            # before the timestamp (same resolution load() uses)
            version = t.snapshot(timestamp=_unquote(gd["ts"])).version
        commit = restore(t, version)
        self._refresh(name)
        return self._row(
            ("table", "restoredVersion", "newVersion"),
            (name, version, commit.version),
        )

    def _h_set_properties(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        props: dict[str, str] = {}
        for kv in re.finditer(r"('[^']*'|\"[^\"]*\"|[\w.]+)\s*=\s*('[^']*'|\"[^\"]*\"|[\w.]+)", m.group("props")):
            props[_unquote(kv.group(1))] = _unquote(kv.group(2))
        commit = self.table(name).set_properties(props)
        return self._row(("table", "version"), (name, commit.version))

    def _h_clone(self, m: re.Match) -> DataFrame:
        from delta_lake_optimizations_spark.table.clone import clone

        shallow = m.group("deep") is None
        src = self.table(m.group("src"))
        dest = clone(src, _unquote(m.group("loc")), shallow=shallow)
        self._tables[m.group("table")] = dest
        self._refresh(m.group("table"))
        return self._row(
            ("table", "source", "shallow"),
            (m.group("table"), m.group("src"), str(shallow).lower()),
        )

    def _h_add_constraint(self, m: re.Match) -> DataFrame:
        commit = self.table(m.group("table")).add_constraint(
            m.group("name"), m.group("expr").strip().strip("()")
        )
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_drop_constraint(self, m: re.Match) -> DataFrame:
        commit = self.table(m.group("table")).drop_constraint(m.group("name"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_show_tblproperties(self, m: re.Match) -> DataFrame:
        props = self.table(m.group("table")).snapshot().properties
        rows = [(k, v) for k, v in sorted(props.items())]
        schema = T.StructType(
            [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
        )
        return self.spark.createDataFrame(rows, schema)

    def _h_reorg(self, m: re.Match) -> DataFrame:
        from delta_lake_optimizations_spark.table import reorg_purge

        commit = reorg_purge(self.table(m.group("table")))
        self._refresh(m.group("table"))
        return self._row(
            ("table", "version", "numFilesPurged"),
            (
                m.group("table"),
                commit.version,
                commit.operation_parameters.get("numFilesPurged", 0),
            ),
        )

    def _h_fsck(self, m: re.Match) -> DataFrame:
        from delta_lake_optimizations_spark.table import fsck_repair

        rep = fsck_repair(self.table(m.group("table")), dry_run=m.group("dry") is not None)
        if not rep["dry_run"]:
            self._refresh(m.group("table"))
        return self._row(
            ("table", "numMissingFiles", "dryRun"),
            (m.group("table"), len(rep["missing_files"]), str(rep["dry_run"]).lower()),
        )

    def _h_insert(self, m: re.Match) -> DataFrame:
        """INSERT INTO (append) / INSERT OVERWRITE (replace) from any
        SELECT — the source query goes through the normal dispatcher, so
        time-travel clauses and registered views all work. INSERT
        OVERWRITE with a trailing ``REPLACE WHERE col = value`` clause
        maps to the predicate-scoped replaceWhere write."""
        name = m.group("table")
        body = m.group("query").strip()
        rw = None
        rw_match = re.match(
            r"REPLACE\s+WHERE\s+(?P<col>\w+)\s*=\s*(?P<val>'[^']*'|\S+)\s+(?P<rest>SELECT.+)$",
            body,
            re.I | re.S,
        )
        if m.group("ow") and rw_match:
            raw = rw_match.group("val")
            val: Any = _unquote(raw)
            if raw == val:  # unquoted — try numeric
                try:
                    val = int(raw)
                except ValueError:
                    try:
                        val = float(raw)
                    except ValueError:
                        pass
            rw = [(rw_match.group("col"), "=", val)]
            body = rw_match.group("rest")
        df = self.spark.sql(self._rewrite_time_travel(body))
        # ANSI INSERT semantics: columns map POSITIONALLY onto the table
        # schema and store-assignment casts the declared types (an INSERT
        # of literal ints into bigint columns must succeed).
        schema = self.table(name).snapshot().schema
        if schema is not None and len(schema.fields) == len(df.columns):
            from pyspark.sql import functions as F

            df = df.toDF(*[f.name for f in schema.fields]).select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
            )
        if m.group("ow"):
            commit = self.table(name).write(df, mode="overwrite", replace_where=rw)
        else:
            commit = self.table(name).write(df, mode="append")
        self._refresh(name)
        return self._row(("table", "version"), (name, commit.version))

    def _h_add_column(self, m: re.Match) -> DataFrame:
        commit = self.table(m.group("table")).add_column(
            m.group("col"), m.group("dtype").strip()
        )
        self._refresh(m.group("table"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_set_default(self, m: re.Match) -> DataFrame:
        tbl = self.table(m.group("table"))
        if m.group("expr") is not None:
            commit = tbl.set_column_default(m.group("col"), m.group("expr").strip())
        else:
            commit = tbl.drop_column_default(m.group("col"))
        self._refresh(m.group("table"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_copy_into(self, m: re.Match) -> DataFrame:
        from delta_lake_optimizations_spark.table.copy_into import copy_into

        def _pairs(blob: str | None) -> dict[str, str]:
            if not blob:
                return {}
            return {
                k: v
                for k, v in re.findall(r"'([^']*)'\s*=\s*'([^']*)'", blob)
            }

        fmt_opts = _pairs(m.group("fmtopts"))
        copy_opts = _pairs(m.group("copyopts"))
        res = copy_into(
            self.table(m.group("table")),
            m.group("src"),
            file_format=m.group("fmt").lower(),
            options=fmt_opts or None,
            pattern=m.group("pattern"),
            force=copy_opts.get("force", "").lower() == "true",
        )
        self._refresh(m.group("table"))
        return self._row(
            ("table", "version", "num_files", "num_rows", "skipped_files"),
            (
                m.group("table"),
                res["version"],
                res["num_files"],
                res["num_rows"],
                res["skipped_files"],
            ),
        )

    def _h_widen_column(self, m: re.Match) -> DataFrame:
        commit = self.table(m.group("table")).widen_column_type(
            m.group("col"), m.group("dtype").strip()
        )
        self._refresh(m.group("table"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_rename_column(self, m: re.Match) -> DataFrame:
        commit = self.table(m.group("table")).rename_column(
            m.group("old"), m.group("new")
        )
        self._refresh(m.group("table"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_drop_column(self, m: re.Match) -> DataFrame:
        commit = self.table(m.group("table")).drop_column(m.group("name"))
        self._refresh(m.group("table"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_update(self, m: re.Match) -> DataFrame:
        name = m.group("table")
        assignments: dict[str, str] = {}
        for part in _split_top_level_commas(m.group("sets")):
            col, _, expr_text = part.partition("=")
            assignments[col.strip().strip("`")] = expr_text.strip()
        commit = update(self.table(name), assignments, m.group("pred"))
        self._refresh(name)
        return self._row(
            ("table", "version", "numRewrittenFiles"),
            (name, commit.version,
             commit.operation_parameters.get("numRewrittenFiles", 0)),
        )

    def _h_merge(self, m: re.Match) -> DataFrame:
        """The common MERGE form: UPDATE SET * / INSERT * with equi-keys.
        The USING side is any query or registered view — evaluated by
        Catalyst, then handed to the native merge."""
        name = m.group("table")
        source = self.spark.sql(f"SELECT * FROM {m.group('src')}")
        # ON t.k = s.k AND t.k2 = s.k2 -> [k, k2]. Only same-named
        # equi-join terms are supported; anything else (literals,
        # differently-named columns, non-equality predicates) would
        # silently change merge semantics, so reject it loudly.
        keys = []
        for term in re.split(r"(?i)\s+AND\s+", m.group("onclause").strip()):
            tm = re.fullmatch(
                r"\s*(?:[\w]+\.)?`?(\w+)`?\s*=\s*(?:[\w]+\.)?`?(\w+)`?\s*", term
            )
            if not tm or tm.group(1) != tm.group(2):
                raise ValueError(
                    f"unsupported MERGE ON term {term.strip()!r}: only "
                    "same-named equi-join terms (t.col = s.col) are "
                    "supported; put extra filters in the USING subquery"
                )
            keys.append(tm.group(1))
        has_update = m.group("upd") is not None
        has_insert = m.group("ins") is not None
        commit = merge(
            self.table(name),
            source,
            on=keys,
            when_matched_update="*" if has_update else None,
            when_not_matched_insert="*" if has_insert else None,
        )
        self._refresh(name)
        return self._row(
            ("table", "version", "numTargetFilesRewritten"),
            (name, commit.version, commit.operation_parameters["numTargetFilesRewritten"]),
        )

    def _h_show_partitions(self, m: re.Match) -> DataFrame:
        """SHOW PARTITIONS t — partition values with file/row counts,
        answered ENTIRELY from the commit log (no data I/O; the 100 TB
        admin query must never scan)."""
        t = self.table(m.group("table"))
        snap = t.snapshot()
        if not snap.partition_columns:
            raise ValueError(f"table {m.group('table')!r} is not partitioned")
        agg: dict[tuple, list[int]] = {}
        for f in snap.files:
            key = tuple(f.partition_values.get(c) for c in snap.partition_columns)
            cur = agg.setdefault(key, [0, 0])
            cur[0] += 1
            cur[1] += f.live_records
        rows = [
            (*key, n_files, n_rows)
            for key, (n_files, n_rows) in sorted(agg.items())
        ]
        return self.spark.createDataFrame(
            rows, [*snap.partition_columns, "numFiles", "numRecords"]
        )

    def _h_convert(self, m: re.Match) -> DataFrame:
        """CONVERT TO GRAFT parquet.`/path` [PARTITIONED BY (col, ...)] —
        Delta's CONVERT TO DELTA: register existing parquet files as v0
        in place (zero data I/O; see table/convert.py)."""
        from delta_lake_optimizations_spark.table.convert import convert_to_graft

        loc = m.group("loc").strip("`")
        parts = m.group("parts")
        cols = [c.strip() for c in parts.split(",")] if parts else None
        t = convert_to_graft(self.spark, loc, partition_columns=cols)
        snap = t.snapshot()
        return self._row(
            ("location", "numFiles", "numRecords"),
            (loc, len(snap.files), snap.num_records),
        )

    def _h_convert_from_delta(self, m: re.Match) -> DataFrame:
        """CONVERT FROM DELTA delta.`/path` [VERSION AS OF n] — read-only
        import of a real delta-spark table (parse the public protocol's
        JSON actions/checkpoints into a GraftTable log next to the
        ``_delta_log``; see table/delta_import.py)."""
        from delta_lake_optimizations_spark.table.delta_import import (
            convert_from_delta,
        )

        loc = m.group("loc").strip("`")
        ver = m.group("ver")
        t = convert_from_delta(
            self.spark, loc, version=int(ver) if ver else None
        )
        snap = t.snapshot()
        return self._row(
            ("location", "numFiles", "numRecords", "versions"),
            (loc, len(snap.files), snap.num_records, snap.version + 1),
        )

    def _h_create_location(self, m: re.Match) -> DataFrame:
        self.register(m.group("table"), _unquote(m.group("loc")))
        return self._row(("table",), (m.group("table"),))

    def _h_create_schema(self, m: re.Match) -> DataFrame:
        """CREATE TABLE t (col type, ..., [col BIGINT GENERATED {ALWAYS |
        BY DEFAULT} AS IDENTITY [(START WITH s INCREMENT BY i)]])
        LOCATION '...' — an EMPTY table with a declared schema; identity
        declarations become the corresponding table properties."""
        cols, props = [], {}
        for item in _split_top_level_commas(m.group("cols")):
            cm = re.match(
                r"(?P<name>\w+)\s+(?P<dtype>[A-Za-z0-9_<>,() ]+?)"
                r"(?:\s+GENERATED\s+(?P<kind>ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
                r"(?:\s*\(\s*START\s+WITH\s+(?P<start>-?\d+)\s+"
                r"INCREMENT\s+BY\s+(?P<step>-?\d+)\s*\))?)?$",
                item.strip(),
                re.I,
            )
            if not cm:
                raise ValueError(f"cannot parse column definition: {item!r}")
            cols.append(f"{cm.group('name')} {cm.group('dtype').strip()}")
            if cm.group("kind"):
                start = cm.group("start") or "1"
                step = cm.group("step") or "1"
                always = "true" if cm.group("kind").upper() == "ALWAYS" else "false"
                props[f"graft.identity.{cm.group('name')}"] = (
                    f"start={start},step={step},always={always}"
                )
        schema = T.StructType.fromDDL(", ".join(cols))
        df = self.spark.createDataFrame([], schema)
        t = GraftTable(self.spark, _unquote(m.group("loc")))
        t.write(df, properties=props or None)
        self._tables[m.group("table")] = t
        self._refresh(m.group("table"))
        return self._row(("table",), (m.group("table"),))

    def _h_truncate(self, m: re.Match) -> DataFrame:
        """TRUNCATE TABLE: one commit removing every row, schema and
        properties kept; old versions remain time-travelable."""
        t = self.table(m.group("table"))
        snap = t.snapshot()
        empty = self.spark.createDataFrame([], snap.schema)
        commit = t.write(
            empty,
            mode="overwrite",
            partition_by=snap.partition_columns or None,
        )
        self._refresh(m.group("table"))
        return self._row(("table", "version"), (m.group("table"), commit.version))

    def _h_ctas(self, m: re.Match) -> DataFrame:
        """CREATE TABLE ... [PARTITIONED BY (...)] LOCATION '...' AS
        SELECT — the CTAS form: run the query, write it as a new
        GraftTable, register the name."""
        df = self.spark.sql(self._rewrite_time_travel(m.group("query").strip()))
        parts = None
        if m.group("parts"):
            parts = [c.strip().strip("`") for c in m.group("parts").split(",") if c.strip()]
        self.create(
            m.group("table"), df, _unquote(m.group("loc")), partition_by=parts
        )
        return self._row(("table",), (m.group("table"),))

    def _h_analyze(self, m: re.Match) -> DataFrame:
        """ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS] — the
        reference's T2 stats-injection flow (docs/02-lab-optimizations.md:
        605-610): registers the snapshot as catalog table ``t_cbo`` and
        feeds Spark's CBO full column statistics."""
        from delta_lake_optimizations_spark.stats import inject_cbo_stats, plan_stats

        name = m.group("table")
        cbo_name = f"{name}_cbo"
        inject_cbo_stats(self.spark, cbo_name, self.table(name))
        ps = plan_stats(self.spark.table(cbo_name))
        return self._row(
            ("table", "catalogTable", "rowCount"),
            (name, cbo_name, int(ps["rowCount"])),
        )

    def _row(self, cols: tuple[str, ...], vals: tuple) -> DataFrame:
        fields = [
            T.StructField(c, T.LongType() if isinstance(v, int) else T.StringType())
            for c, v in zip(cols, vals)
        ]
        return self.spark.createDataFrame([vals], T.StructType(fields))

    def _h_cluster_by(self, m: re.Match) -> DataFrame:
        """Delta-liquid-clustering-parity ``ALTER TABLE t CLUSTER BY
        (c1, c2)`` / ``CLUSTER BY NONE`` — persists the clustering key
        that bare OPTIMIZE re-clusters on (maintenance.CLUSTER_BY_PROP)."""
        from delta_lake_optimizations_spark.table.maintenance import CLUSTER_BY_PROP

        name = m.group("table")
        cols = m.group("cols")
        value = (
            ""
            if cols is None
            else ",".join(c.strip().strip("`") for c in cols.split(","))
        )
        self.table(name).set_properties({CLUSTER_BY_PROP: value})
        return self._row(("table", "clusterBy"), (name, value))

    def _h_generate(self, m: re.Match) -> DataFrame:
        """Delta-parity ``GENERATE symlink_format_manifest FOR TABLE t``
        (table/maintenance.py::generate_manifest)."""
        from delta_lake_optimizations_spark.table import generate_manifest

        mode = m.group("mode").strip("'").lower()
        if mode == "delta_log":
            from delta_lake_optimizations_spark.table.delta_import import (
                generate_delta_log,
            )

            r = generate_delta_log(self.table(m.group("table")))
            return self._row(
                ("logDir", "numFiles", "version"),
                (r["log_dir"], r["n_files"], r["version"]),
            )
        if mode != "symlink_format_manifest":
            raise ValueError(f"GENERATE: unsupported mode {mode!r}")
        r = generate_manifest(self.table(m.group("table")))
        return self._row(
            ("manifestRoot", "numManifests", "numFiles"),
            (r["manifest_root"], r["n_manifests"], r["n_files"]),
        )

    def _h_bloom_create(self, m: re.Match) -> DataFrame:
        """Databricks-parity ``CREATE BLOOMFILTER INDEX`` — builds the
        table's Bloom sidecars (table/bloom.py) for the listed columns."""
        from delta_lake_optimizations_spark.table.bloom import bloom_build

        name = m.group("table")
        cols = [c.strip().strip("`") for c in m.group("cols").split(",")]
        fpp = float(m.group("fpp")) if m.group("fpp") else 0.01
        built = bloom_build(self.table(name), cols, fpp=fpp)
        return self._row(
            ("table", "columns", "filesIndexed"),
            (name, ",".join(cols), sum(built.values())),
        )

    def _h_bloom_drop(self, m: re.Match) -> DataFrame:
        import os as _os

        from delta_lake_optimizations_spark.table.bloom import _sidecar_paths

        name = m.group("table")
        cols = [c.strip().strip("`") for c in m.group("cols").split(",")]
        n = 0
        t = self.table(name)
        for col in cols:
            for p in _sidecar_paths(t, col):
                _os.remove(p)
                n += 1
        return self._row(
            ("table", "columns", "sidecarsDropped"), (name, ",".join(cols), n)
        )

    _ROUTES = [
        (
            re.compile(
                rf"OPTIMIZE\s+(?P<table>{_IDENT})"
                rf"(?:\s+WHERE\s+(?P<where>.+?))?"
                rf"(?:\s+ZORDER\s+BY\s*\(\s*(?P<zorder>[^)]+)\))?"
                rf"(?:\s+(?P<vorder>VORDER))?$",
                re.I,
            ),
            _h_optimize,
        ),
        (
            re.compile(
                rf"VACUUM\s+(?P<table>{_IDENT})"
                rf"(?:\s+RETAIN\s+(?P<hours>\d+(?:\.\d+)?)\s+HOURS)?"
                rf"(?:\s+(?P<dry>DRY\s+RUN))?$",
                re.I,
            ),
            _h_vacuum,
        ),
        (re.compile(rf"SHOW\s+PARTITIONS\s+(?P<table>{_IDENT})$", re.I), _h_show_partitions),
        (re.compile(rf"DESCRIBE\s+HISTORY\s+(?P<table>{_IDENT})$", re.I), _h_history),
        (re.compile(rf"DESCRIBE\s+DETAIL\s+(?P<table>{_IDENT})$", re.I), _h_detail),
        (re.compile(rf"DESCRIBE\s+EXTENDED\s+(?P<table>{_IDENT})$", re.I), _h_extended),
        (
            re.compile(
                rf"DELETE\s+FROM\s+(?P<table>{_IDENT})\s+WHERE\s+(?P<pred>.+)$", re.I | re.S
            ),
            _h_delete,
        ),
        (
            re.compile(
                rf"UPDATE\s+(?P<table>{_IDENT})\s+SET\s+(?P<sets>.+?)"
                rf"(?:\s+WHERE\s+(?P<pred>.+))?$",
                re.I | re.S,
            ),
            _h_update,
        ),
        (
            re.compile(
                rf"RESTORE\s+(?:TABLE\s+)?(?P<table>{_IDENT})\s+TO\s+"
                rf"(?:VERSION\s+AS\s+OF\s+(?P<version>\d+)"
                rf"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']+'))$",
                re.I,
            ),
            _h_restore,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+SET\s+TBLPROPERTIES\s*\((?P<props>.+)\)$",
                re.I | re.S,
            ),
            _h_set_properties,
        ),
        (
            re.compile(
                r"CONVERT\s+TO\s+(?:DELTA|GRAFT)\s+parquet\.(?P<loc>`[^`]+`)"
                r"(?:\s+PARTITIONED\s+BY\s*\(\s*(?P<parts>[^)]+)\))?$",
                re.I,
            ),
            _h_convert,
        ),
        (
            re.compile(
                r"CONVERT\s+FROM\s+DELTA\s+delta\.(?P<loc>`[^`]+`)"
                r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+))?$",
                re.I,
            ),
            _h_convert_from_delta,
        ),
        (
            re.compile(
                rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>{_IDENT})\s+"
                rf"USING\s+(?:DELTA|GRAFT)\s+LOCATION\s+(?P<loc>'[^']*'|\"[^\"]*\")$",
                re.I,
            ),
            _h_create_location,
        ),
        (
            re.compile(
                rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>{_IDENT})\s+"
                rf"(?:USING\s+(?:DELTA|GRAFT)\s+)?"
                rf"(?:PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s+)?"
                rf"LOCATION\s+(?P<loc>'[^']*'|\"[^\"]*\")\s+"
                rf"AS\s+(?P<query>(?:SELECT|VALUES|WITH)\s+.+)$",
                re.I | re.S,
            ),
            _h_ctas,
        ),
        (
            re.compile(
                rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>{_IDENT})\s*"
                rf"\((?P<cols>.+)\)\s*"
                rf"(?:USING\s+(?:DELTA|GRAFT)\s+)?"
                rf"LOCATION\s+(?P<loc>'[^']*'|\"[^\"]*\")$",
                re.I | re.S,
            ),
            _h_create_schema,
        ),
        (
            re.compile(
                rf"TRUNCATE\s+TABLE\s+(?P<table>{_IDENT})$",
                re.I,
            ),
            _h_truncate,
        ),
        (
            re.compile(
                rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>{_IDENT})\s+"
                rf"(?:(?P<deep>DEEP)\s+|SHALLOW\s+)?CLONE\s+(?P<src>{_IDENT})\s+"
                rf"LOCATION\s+(?P<loc>'[^']*'|\"[^\"]*\")$",
                re.I,
            ),
            _h_clone,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+ADD\s+CONSTRAINT\s+"
                rf"(?P<name>\w+)\s+CHECK\s*(?P<expr>\(.+\))$",
                re.I | re.S,
            ),
            _h_add_constraint,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+DROP\s+CONSTRAINT\s+(?P<name>\w+)$",
                re.I,
            ),
            _h_drop_constraint,
        ),
        (
            re.compile(
                rf"SHOW\s+TBLPROPERTIES\s+(?P<table>{_IDENT})$",
                re.I,
            ),
            _h_show_tblproperties,
        ),
        (
            re.compile(
                rf"REORG\s+TABLE\s+(?P<table>{_IDENT})\s+APPLY\s*\(\s*PURGE\s*\)$",
                re.I,
            ),
            _h_reorg,
        ),
        (
            re.compile(
                rf"FSCK\s+REPAIR\s+TABLE\s+(?P<table>{_IDENT})(?P<dry>\s+DRY\s+RUN)?$",
                re.I,
            ),
            _h_fsck,
        ),
        (
            re.compile(
                rf"INSERT\s+(?:(?P<ow>OVERWRITE)|INTO)\s+(?:TABLE\s+)?"
                rf"(?P<table>{_IDENT})\s+(?P<query>(?:REPLACE\s+WHERE\s+.+?)?(?:SELECT|VALUES|WITH)\s+.+)$",
                re.I | re.S,
            ),
            _h_insert,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+ADD\s+COLUMNS?\s*"
                rf"\(?\s*(?P<col>\w+)\s+(?P<dtype>[A-Za-z0-9_<>,() ]+?)\s*\)?$",
                re.I,
            ),
            _h_add_column,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+ALTER\s+COLUMN\s+"
                rf"(?P<col>\w+)\s+(?:SET\s+DEFAULT\s+(?P<expr>.+)|DROP\s+DEFAULT)$",
                re.I | re.S,
            ),
            _h_set_default,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+ALTER\s+COLUMN\s+"
                rf"(?P<col>\w+)\s+TYPE\s+(?P<dtype>.+)$",
                re.I | re.S,
            ),
            _h_widen_column,
        ),
        (
            re.compile(
                rf"COPY\s+INTO\s+(?P<table>{_IDENT})\s+FROM\s+'(?P<src>[^']+)'\s+"
                rf"FILEFORMAT\s*=\s*(?P<fmt>\w+)"
                rf"(?:\s+PATTERN\s*=\s*'(?P<pattern>[^']+)')?"
                rf"(?:\s+FORMAT_OPTIONS\s*\((?P<fmtopts>[^)]*)\))?"
                rf"(?:\s+COPY_OPTIONS\s*\((?P<copyopts>[^)]*)\))?$",
                re.I | re.S,
            ),
            _h_copy_into,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+RENAME\s+COLUMN\s+"
                rf"(?P<old>\w+)\s+TO\s+(?P<new>\w+)$",
                re.I,
            ),
            _h_rename_column,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+DROP\s+COLUMNS?\s*"
                rf"\(?\s*(?P<name>\w+)\s*\)?$",
                re.I,
            ),
            _h_drop_column,
        ),
        (
            re.compile(
                rf"MERGE\s+INTO\s+(?P<table>{_IDENT})(?:\s+AS\s+\w+|\s+\w+)?\s+"
                rf"USING\s+(?P<src>{_IDENT})(?:\s+AS\s+\w+|\s+\w+)?\s+"
                rf"ON\s+(?P<onclause>.+?)\s+"
                rf"(?P<upd>WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s*)?"
                rf"(?P<ins>WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*)?$",
                re.I | re.S,
            ),
            _h_merge,
        ),
        (
            re.compile(
                rf"ANALYZE\s+TABLE\s+(?P<table>{_IDENT})\s+COMPUTE\s+STATISTICS"
                rf"(?:\s+FOR\s+ALL\s+COLUMNS)?$",
                re.I,
            ),
            _h_analyze,
        ),
        (
            re.compile(
                rf"GENERATE\s+(?P<mode>'?[A-Za-z_]+'?)\s+FOR\s+TABLE\s+"
                rf"(?P<table>{_IDENT})$",
                re.I,
            ),
            _h_generate,
        ),
        (
            re.compile(
                rf"CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+(?P<table>{_IDENT})\s+"
                rf"FOR\s+COLUMNS\s*\(\s*(?P<cols>[^)]+?)\s*\)"
                rf"(?:\s+OPTIONS\s*\(\s*fpp\s*=?\s*(?P<fpp>[0-9.]+)\s*\))?$",
                re.I,
            ),
            _h_bloom_create,
        ),
        (
            re.compile(
                rf"DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+(?P<table>{_IDENT})\s+"
                rf"FOR\s+COLUMNS\s*\(\s*(?P<cols>[^)]+?)\s*\)$",
                re.I,
            ),
            _h_bloom_drop,
        ),
        (
            re.compile(
                rf"ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+CLUSTER\s+BY\s+"
                rf"(?:\(\s*(?P<cols>[^)]+?)\s*\)|NONE)$",
                re.I,
            ),
            _h_cluster_by,
        ),
    ]
