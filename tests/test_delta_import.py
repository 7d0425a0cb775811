"""CONVERT FROM DELTA (table/delta_import.py): import a hand-built but
protocol-conformant ``_delta_log`` (the public Delta spec's JSON actions)
and verify the GraftTable snapshot matches the expected parquet file set
at every version — multi-commit history, a remove, a schema change, a
checkpoint base, URL-encoded paths, stats import, and the refusal cases
(deletion vectors, column mapping, cleaned logs)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.table.delta_import import (
    UnsupportedDeltaFeature,
    convert_from_delta,
)
from delta_lake_optimizations_spark.table.graft_table import GraftTable

_SCHEMA_V0 = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "country", "type": "string", "nullable": True, "metadata": {}},
            {"name": "price", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)
_SCHEMA_V3 = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "country", "type": "string", "nullable": True, "metadata": {}},
            {"name": "price", "type": "double", "nullable": True, "metadata": {}},
            {"name": "extra", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)
_TS0 = 1_700_000_000_000


def _write_part(root: str, name: str, ids, countries, prices, extra=None) -> dict:
    cols = {
        "id": pa.array(ids, pa.int64()),
        "country": pa.array(countries, pa.string()),
        "price": pa.array(prices, pa.float64()),
    }
    if extra is not None:
        cols["extra"] = pa.array(extra, pa.string())
    table = pa.table(cols)
    path = os.path.join(root, name)
    pq.write_table(table, path)
    stats = {
        "numRecords": len(ids),
        "minValues": {"id": min(ids), "country": min(countries)},
        "maxValues": {"id": max(ids), "country": max(countries)},
        "nullCount": {"id": 0, "country": 0, "price": 0},
    }
    return {
        "path": name,
        "partitionValues": {},
        "size": os.path.getsize(path),
        "modificationTime": _TS0,
        "dataChange": True,
        "stats": json.dumps(stats),
    }


def _commit(log_dir: str, v: int, actions: list[dict]) -> None:
    with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta_action(schema_string: str, configuration=None) -> dict:
    return {
        "metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": configuration or {},
            "createdTime": _TS0,
        }
    }


def _make_delta_table(root: str) -> None:
    """v0: 2 adds; v1: append; v2: DELETE (remove+rewrite); v3: schema
    change + add using the new column."""
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    a0 = _write_part(root, "part-00000-aaa.snappy.parquet", [1, 2], ["US", "US"], [1.0, 2.0])
    a1 = _write_part(root, "part-00001-bbb.snappy.parquet", [3, 4], ["DE", "FR"], [3.0, 4.0])
    _commit(root + "/_delta_log", 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(_SCHEMA_V0),
        {"add": a0},
        {"add": a1},
    ])
    a2 = _write_part(root, "part-00002-ccc.snappy.parquet", [5, 6], ["US", "GB"], [5.0, 6.0])
    a2 = {**a2, "stats": None}  # exercise the footer-read fallback
    _commit(log, 1, [
        {"commitInfo": {"timestamp": _TS0 + 1000, "operation": "WRITE"}},
        {"add": a2},
    ])
    # DELETE id=1: rewrite part-00000 keeping id=2
    a3 = _write_part(root, "part-00003-ddd.snappy.parquet", [2], ["US"], [2.0])
    _commit(log, 2, [
        {"commitInfo": {"timestamp": _TS0 + 2000, "operation": "DELETE"}},
        {"remove": {"path": "part-00000-aaa.snappy.parquet",
                    "deletionTimestamp": _TS0 + 2000, "dataChange": True}},
        {"add": a3},
    ])
    a4 = _write_part(
        root, "part-00004-eee.snappy.parquet", [7], ["JP"], [7.0], extra=["x"]
    )
    _commit(log, 3, [
        {"commitInfo": {"timestamp": _TS0 + 3000, "operation": "ADD COLUMNS"}},
        _meta_action(_SCHEMA_V3),
        {"add": a4},
    ])


def test_convert_full_history(spark, tmp_path):
    root = str(tmp_path / "delta_sales")
    _make_delta_table(root)
    t = convert_from_delta(spark, root)

    # final snapshot: ids {2,3,4,5,6,7}, schema includes `extra`
    final = t.load().orderBy("id")
    assert [r["id"] for r in final.collect()] == [2, 3, 4, 5, 6, 7]
    assert final.columns == ["id", "country", "price", "extra"]
    # pre-schema-change files null-fill the new column
    assert final.filter(F.col("extra").isNotNull()).count() == 1

    # version selection mirrors delta versions
    assert sorted(r["id"] for r in t.load(version=0).collect()) == [1, 2, 3, 4]
    assert sorted(r["id"] for r in t.load(version=1).collect()) == [1, 2, 3, 4, 5, 6]
    assert sorted(r["id"] for r in t.load(version=2).collect()) == [2, 3, 4, 5, 6]
    assert t.load(version=1).columns == ["id", "country", "price"]

    # history preserved: 4 commits, delta commitInfo timestamps intact
    hist = {r["version"]: r for r in t.history().collect()}
    assert len(hist) == 4
    assert hist[2]["operation"] == "DELTA DELETE"
    assert hist[3]["timestamp"] == t.spark.sql(
        f"SELECT timestamp_millis({_TS0 + 3000}) AS t"
    ).collect()[0]["t"]

    # O(1) metadata row count matches
    assert t.count_rows() == 6


def test_timestamp_as_of_uses_delta_clock(spark, tmp_path):
    root = str(tmp_path / "delta_ts")
    _make_delta_table(root)
    t = convert_from_delta(spark, root)
    from datetime import datetime, timezone

    at = datetime.fromtimestamp((_TS0 + 1500) / 1000, tz=timezone.utc)
    assert sorted(r["id"] for r in t.load(timestamp=at).collect()) == [
        1, 2, 3, 4, 5, 6,
    ]


def test_version_truncation_and_skipping_stats(spark, tmp_path):
    root = str(tmp_path / "delta_trunc")
    _make_delta_table(root)
    t = convert_from_delta(spark, root, version=1)
    assert t.latest_version() == 1
    assert sorted(r["id"] for r in t.load().collect()) == [1, 2, 3, 4, 5, 6]
    # imported min/max stats drive file skipping: id=1 lives only in
    # part-00000 (ids 1-2)
    assert t.files_scanned(skip_where=[("id", "=", 1)]) == 1
    assert t.files_scanned(skip_where=[("id", "=", 999)]) == 0


def test_url_encoded_paths_decode(spark, tmp_path):
    root = str(tmp_path / "delta_enc")
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_part(root, "part with space.parquet", [1], ["US"], [1.0])
    add["path"] = "part%20with%20space.parquet"
    _commit(log, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(_SCHEMA_V0),
        {"add": add},
    ])
    t = convert_from_delta(spark, root)
    assert t.load().count() == 1


def test_checkpoint_base_replaces_cleaned_json(spark, tmp_path):
    """delta-spark checkpoints then cleans old JSON commits; the importer
    must rebuild state from the checkpoint parquet and replay the tail."""
    root = str(tmp_path / "delta_ckpt")
    _make_delta_table(root)
    log = os.path.join(root, "_delta_log")

    # checkpoint at v2: state = metaData(v0 schema) + the 4 live files
    live = [
        ("part-00001-bbb.snappy.parquet", 2),
        ("part-00002-ccc.snappy.parquet", 2),
        ("part-00003-ddd.snappy.parquet", 1),
    ]
    add_rows = [
        {
            "add": {
                "path": p,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, p)),
                "modificationTime": _TS0,
                "dataChange": False,
                "stats": json.dumps({"numRecords": n}),
            },
            "metaData": None,
            "protocol": None,
        }
        for p, n in live
    ]
    meta_row = {
        "add": None,
        "metaData": json.loads(json.dumps(_meta_action(_SCHEMA_V0)["metaData"])),
        "protocol": None,
    }
    proto_row = {"add": None, "metaData": None,
                 "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    ckpt_schema = (
        "add struct<path:string,partitionValues:map<string,string>,size:bigint,"
        "modificationTime:bigint,dataChange:boolean,stats:string>, "
        "metaData struct<id:string,format:struct<provider:string,"
        "options:map<string,string>>,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>,"
        "createdTime:bigint>, "
        "protocol struct<minReaderVersion:int,minWriterVersion:int>"
    )
    ckpt_df = spark.createDataFrame([*add_rows, meta_row, proto_row], ckpt_schema)
    ckpt_tmp = str(tmp_path / "ckpt_out")
    ckpt_df.coalesce(1).write.parquet(ckpt_tmp)
    part = [f for f in os.listdir(ckpt_tmp) if f.endswith(".parquet")][0]
    os.rename(
        os.path.join(ckpt_tmp, part),
        os.path.join(log, f"{2:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 5}, fh)
    for v in (0, 1, 2):  # the cleanup delta-spark performs
        os.unlink(os.path.join(log, f"{v:020d}.json"))

    t = convert_from_delta(spark, root)
    # graft v0 = checkpoint state (delta v2), graft v1 = delta v3
    assert t.latest_version() == 1
    assert sorted(r["id"] for r in t.load().collect()) == [2, 3, 4, 5, 6, 7]
    assert sorted(r["id"] for r in t.load(version=0).collect()) == [2, 3, 4, 5, 6]
    hist = {r["version"]: r for r in t.history().collect()}
    params = hist[0]["operationParameters"]
    if isinstance(params, str):
        params = json.loads(params)
    assert str(params["deltaVersion"]) == "2"


def test_refusals(spark, tmp_path):
    # deletion vector with an ABSOLUTE-path descriptor ('p' points outside
    # the table — the self-contained import contract refuses it; 'u'/'i'
    # DVs import since r11, see test_dv_import_* below)
    root = str(tmp_path / "delta_dv")
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_part(root, "part-00000.parquet", [1], ["US"], [1.0])
    add["deletionVector"] = {
        "storageType": "p",
        "pathOrInlineDv": "s3://bucket/elsewhere/deletion_vector_x.bin",
        "offset": 1, "sizeInBytes": 36, "cardinality": 1,
    }
    _commit(log, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta_action(_SCHEMA_V0),
        {"add": add},
    ])
    with pytest.raises(UnsupportedDeltaFeature):
        convert_from_delta(spark, root)

    # column mapping
    root2 = str(tmp_path / "delta_cm")
    os.makedirs(root2)
    log2 = os.path.join(root2, "_delta_log")
    os.makedirs(log2)
    add2 = _write_part(root2, "part-00000.parquet", [1], ["US"], [1.0])
    _commit(log2, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta_action(_SCHEMA_V0, {"delta.columnMapping.mode": "name"}),
        {"add": add2},
    ])
    with pytest.raises(UnsupportedDeltaFeature):
        convert_from_delta(spark, root2)

    # cleaned log without checkpoint
    root3 = str(tmp_path / "delta_gap")
    _make_delta_table(root3)
    os.unlink(os.path.join(root3, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(UnsupportedDeltaFeature):
        convert_from_delta(spark, root3)


def test_sql_route(spark, tmp_path):
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog

    root = str(tmp_path / "delta_sql")
    _make_delta_table(root)
    cat = GraftCatalog(spark)
    row = cat.sql(f"CONVERT FROM DELTA delta.`{root}`").collect()[0]
    assert row["numFiles"] == 4
    assert row["numRecords"] == 6
    assert row["versions"] == 4
    # imported table is queryable through the catalog like any GraftTable
    cat.register("imported_sales", root)
    assert cat.sql(
        "SELECT COUNT(*) AS n FROM imported_sales"
    ).collect()[0]["n"] == 6


# --- GENERATE delta_log: the outbound half of interop ---


def test_generate_delta_log_round_trip(spark, tmp_path):
    """Export a partitioned GraftTable snapshot as a _delta_log, copy the
    data + exported log to a fresh location (as an external Delta reader
    would see it), import it back with convert_from_delta, and require
    identical contents, schema, partition values, and stats-driven file
    skipping."""
    import shutil

    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,
    )

    src = str(tmp_path / "graft_src")
    t = GraftTable(spark, src)
    df = spark.createDataFrame(
        [(i, "US" if i % 2 == 0 else "DE", float(i)) for i in range(100)],
        "id long, country string, price double",
    )
    t.write(df, partition_by=["country"])
    r = generate_delta_log(t)
    assert r["n_files"] >= 2 and os.path.isdir(r["log_dir"])

    # ship data files + _delta_log only (no GraftTable _log)
    dst = str(tmp_path / "delta_view")
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("_log"))
    t2 = convert_from_delta(spark, dst)
    got = t2.load()
    assert got.count() == 100
    assert sorted(got.columns) == ["country", "id", "price"]
    assert {r["country"] for r in got.select("country").distinct().collect()} == {
        "US", "DE",
    }
    assert sorted(r["id"] for r in got.collect()) == list(range(100))
    # exported stats round-trip into the importer's file skipping
    assert t2.files_scanned(skip_where=[("id", "=", 0)]) >= 1
    assert t2.files_scanned(skip_where=[("id", "=", 10_000)]) == 0


def test_generate_delta_log_exports_dv_tables(spark, tmp_path):
    """r11: a DV-carrying snapshot exports REAL Delta deletion vectors
    (protocol 3/7 + sidecar .bin + per-add descriptors) instead of
    refusing; re-importing through our own DV import path yields the
    post-delete contents — the full bidirectional round trip."""
    import shutil

    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,
    )
    from delta_lake_optimizations_spark.table.maintenance import delete

    src = str(tmp_path / "graft_dv")
    t = GraftTable(spark, src)
    t.write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, price double"
        ),
        properties={"graft.enableDeletionVectors": "true"},
    )
    delete(t, "id % 6 = 1", deletion_vectors=True)
    snap = t.snapshot()
    assert any(f.dv_count for f in snap.files)
    v_before = snap.version

    r = generate_delta_log(t)
    assert t.snapshot().version == v_before  # NO purge commit happened
    # the log carries the DV protocol + descriptor + sidecar
    log = os.path.join(src, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(line) for line in open(log)]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert protos[0]["minReaderVersion"] == 3
    assert "deletionVectors" in protos[0]["readerFeatures"]
    dv_adds = [a["add"] for a in actions if "add" in a
               and a["add"].get("deletionVector")]
    assert dv_adds and all(
        a["deletionVector"]["storageType"] == "u" for a in dv_adds
    )
    assert any(
        fn.startswith("deletion_vector_") and fn.endswith(".bin")
        for fn in os.listdir(src)
    )
    assert json.loads(dv_adds[0]["stats"])["tightBounds"] is False

    # round trip: copy data + DV sidecar + _delta_log (not _log/_graft_dv)
    dst = str(tmp_path / "delta_dv_view")
    shutil.copytree(
        src, dst, ignore=shutil.ignore_patterns("_log", "_dv", "_graft_dv")
    )
    t2 = convert_from_delta(spark, dst)
    got = sorted(row["id"] for row in t2.load().collect())
    assert got == [i for i in range(50) if i % 6 != 1]
    assert t2.count_rows() == len(got)


def test_generate_delta_log_purge_on_export_round_trip(spark, tmp_path):
    """VERDICT r09 #6: purge=True removes the DV speed bump — delete rows
    (deletion vectors on), export with purge, re-import the exported view,
    and require the contents to match the post-delete table (no
    resurrected rows, no DV refusal)."""
    import shutil

    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,
    )
    from delta_lake_optimizations_spark.table.maintenance import delete

    src = str(tmp_path / "graft_dv_purge")
    t = GraftTable(spark, src)
    t.write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, price double"
        ),
        properties={"graft.enableDeletionVectors": "true"},
    )
    delete(t, "id % 5 = 2", deletion_vectors=True)
    assert any(f.dv_count for f in t.snapshot().files)
    v_before = t.snapshot().version

    r = generate_delta_log(t, purge=True)
    # the purge was a real REORG commit and the snapshot is DV-free now
    assert t.snapshot().version == v_before + 1
    assert not any(f.dv_count for f in t.snapshot().files)
    assert r["n_files"] >= 1

    dst = str(tmp_path / "delta_view_purged")
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("_log"))
    t2 = convert_from_delta(spark, dst)
    got = sorted(row["id"] for row in t2.load().collect())
    assert got == [i for i in range(50) if i % 5 != 2]

    # idempotent: a DV-free table exports with purge=True without a new commit
    v_now = t.snapshot().version
    generate_delta_log(t, purge=True)
    assert t.snapshot().version == v_now


def test_generate_delta_log_sql_route(spark, tmp_path):
    from delta_lake_optimizations_spark.frontdoor import GraftCatalog
    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,  # noqa: F401 — route under test
    )

    src = str(tmp_path / "graft_sqlgen")
    t = GraftTable(spark, src)
    t.write(spark.createDataFrame([(1, "x")], "id long, s string"))
    cat = GraftCatalog(spark)
    cat.register("gen_src", src)
    row = cat.sql("GENERATE delta_log FOR TABLE gen_src").collect()[0]
    assert row["numFiles"] >= 1 and row["version"] == 0
    assert os.path.exists(
        os.path.join(src, "_delta_log", f"{0:020d}.json")
    )


def test_generate_delta_log_history_checkpoint_round_trip(spark, tmp_path):
    """history=True export of a 26-version table writes checkpoint parquet
    at versions 10 and 20 plus _last_checkpoint; after deleting every
    pre-checkpoint JSON commit (log cleanup), re-import replays from the
    checkpoint and contents are identical, and version selection works for
    the retained tail."""
    import shutil

    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,
    )

    src = str(tmp_path / "graft_hist")
    t = GraftTable(spark, src)
    t.write(spark.createDataFrame([(0, 0.0)], "id long, price double"))
    for i in range(1, 26):
        t.write(
            spark.createDataFrame([(i, float(i))], "id long, price double"),
            mode="append",
        )
    r = generate_delta_log(t, history=True, checkpoint_interval=10)
    assert r["versions"] == 26 and r["version"] == 25
    assert r["checkpoint"] == 20
    log = os.path.join(src, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{10:020d}.checkpoint.parquet"))
    assert os.path.exists(os.path.join(log, f"{20:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint")) as fh:
        assert json.load(fh)["version"] == 20

    dst = str(tmp_path / "delta_hist_view")
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("_log"))
    # log cleanup: delete every JSON commit below the checkpoint
    for v in range(20):
        p = os.path.join(dst, "_delta_log", f"{v:020d}.json")
        if os.path.exists(p):
            os.unlink(p)
    t2 = convert_from_delta(spark, dst)
    got = sorted(r2["id"] for r2 in t2.load().collect())
    assert got == list(range(26))
    # graft version 0 of the import == delta checkpoint version 20 state
    assert t2.load(version=0).count() == 21
    assert t2.load(version=5).count() == 26


def test_generate_delta_log_refuses_foreign_log(spark, tmp_path):
    """Overwrite guard: generate_delta_log must refuse to destroy a
    _delta_log it did not produce (the in-place convert_from_delta source),
    and force=True must override; a prior graft export is replaceable."""
    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,
    )

    root = str(tmp_path / "delta_real")
    _make_delta_table(root)
    t = convert_from_delta(spark, root)
    with pytest.raises(ValueError, match="refusing to destroy"):
        generate_delta_log(t)
    # the real log is intact after the refusal
    assert os.path.exists(
        os.path.join(root, "_delta_log", f"{0:020d}.json")
    )
    r = generate_delta_log(t, force=True)
    assert r["version"] == 0
    # and a second (now graft-stamped) export needs no force
    r2 = generate_delta_log(t)
    assert r2["version"] == 0


def test_protocol_reader_feature_allowlist(spark, tmp_path):
    """Reader-v3 tables gate on an ALLOWLIST: unknown/future readerFeatures
    refuse (the Delta protocol requires it), while timestampNtz-only
    tables import."""
    # unknown feature -> refuse even though it's not in any denylist
    root = str(tmp_path / "delta_future")
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_part(root, "part-00000.parquet", [1], ["US"], [1.0])
    _commit(log, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["someFutureFeature"],
                      "writerFeatures": ["someFutureFeature"]}},
        _meta_action(_SCHEMA_V0),
        {"add": add},
    ])
    with pytest.raises(UnsupportedDeltaFeature):
        convert_from_delta(spark, root)

    # timestampNtz alone -> allowed
    root2 = str(tmp_path / "delta_ntz")
    os.makedirs(root2)
    log2 = os.path.join(root2, "_delta_log")
    os.makedirs(log2)
    add2 = _write_part(root2, "part-00000.parquet", [1], ["US"], [1.0])
    _commit(log2, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["timestampNtz"],
                      "writerFeatures": ["timestampNtz"]}},
        _meta_action(_SCHEMA_V0),
        {"add": add2},
    ])
    t = convert_from_delta(spark, root2)
    assert t.load().count() == 1


def test_refused_export_runs_no_purge_commit(spark, tmp_path):
    """ADVICE r10: a refused export must be side-effect free — with
    column mapping active AND DVs present, generate_delta_log(purge=True)
    must raise WITHOUT first running the reorg_purge commit."""
    from delta_lake_optimizations_spark.table.delta_import import (
        generate_delta_log,
    )
    from delta_lake_optimizations_spark.table.maintenance import delete

    src = str(tmp_path / "graft_colmap_dv")
    t = GraftTable(spark, src)
    t.write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, price double"
        ),
        properties={"graft.enableDeletionVectors": "true"},
    )
    delete(t, "id = 7", deletion_vectors=True)
    t.rename_column("price", "amount")  # activates column mapping
    assert any(f.dv_count for f in t.snapshot().files)
    v_before = t.snapshot().version

    with pytest.raises(ValueError, match="column mapping"):
        generate_delta_log(t, purge=True)
    # the refusal left the table untouched: same version, DVs still there
    assert t.snapshot().version == v_before
    assert any(f.dv_count for f in t.snapshot().files)


# ---------------------------------------------------------------------------
# Deletion-vector import (VERDICT r10 #2) — hand-built protocol-conformant
# DV fixture log: sidecar ('u', with and without a path prefix) + inline
# ('i') descriptors, contents checked at every version.
# ---------------------------------------------------------------------------


def _make_dv_delta_table(root: str) -> None:
    """v0: two adds (5 + 3 rows); v1: DV delete of rows 1,3 in file A via
    a 'u' sidecar under a 2-char prefix dir; v2: DV grows to rows 1,3,4
    via an inline 'i' descriptor (the add at v2 REPLACES v1's entry for
    the path, exactly a real writer's remove+add pair)."""
    import uuid as _uuid

    from delta_lake_optimizations_spark.table import roaring

    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    a0 = _write_part(root, "part-00000-dva.snappy.parquet",
                     [10, 11, 12, 13, 14], ["US"] * 5, [float(i) for i in range(5)])
    a1 = _write_part(root, "part-00001-dvb.snappy.parquet",
                     [20, 21, 22], ["DE"] * 3, [1.0, 2.0, 3.0])
    _commit(log, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta_action(_SCHEMA_V0),
        {"add": a0},
        {"add": a1},
    ])

    # v1: sidecar DV (rows 1, 3 of file A), stored under prefix "ab"
    u = _uuid.uuid4()
    os.makedirs(os.path.join(root, "ab"), exist_ok=True)
    dv_file = os.path.join(root, "ab", f"deletion_vector_{u}.bin")
    blob1 = roaring.serialize_dv_blob([1, 3])
    (off, size), = roaring.write_dv_file(dv_file, [blob1])
    a0_dv = {**a0, "deletionVector": {
        "storageType": "u",
        "pathOrInlineDv": "ab" + roaring.z85_encode(u.bytes),
        "offset": off, "sizeInBytes": size, "cardinality": 2,
    }}
    _commit(log, 1, [
        {"commitInfo": {"timestamp": _TS0 + 1000, "operation": "DELETE"}},
        {"remove": {"path": a0["path"], "deletionTimestamp": _TS0 + 1000,
                    "dataChange": True}},
        {"add": a0_dv},
    ])

    # v2: DV grows to rows 1,3,4 — inline descriptor this time
    blob2 = roaring.serialize_dv_blob([1, 3, 4])
    a0_dv2 = {**a0, "deletionVector": {
        "storageType": "i",
        "pathOrInlineDv": roaring.dv_inline_encode(blob2),
        "sizeInBytes": len(blob2), "cardinality": 3,
    }}
    _commit(log, 2, [
        {"commitInfo": {"timestamp": _TS0 + 2000, "operation": "DELETE"}},
        {"remove": {"path": a0["path"], "deletionTimestamp": _TS0 + 2000,
                    "dataChange": True}},
        {"add": a0_dv2},
    ])


def test_dv_import_contents_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "delta_dv_ok")
    _make_dv_delta_table(root)
    t = convert_from_delta(spark, root)

    def ids(**kw):
        return sorted(r["id"] for r in t.load(**kw).collect())

    # head (v2): rows 11, 13, 14 of file A are deleted
    assert ids() == [10, 12, 20, 21, 22]
    # time travel ACROSS the DV commits
    assert ids(version=0) == [10, 11, 12, 13, 14, 20, 21, 22]
    assert ids(version=1) == [10, 12, 14, 20, 21, 22]
    # metadata-only COUNT(*) sees live records through dv_count
    assert t.count_rows() == 5
    assert t.count_rows(version=1) == 6
    assert t.count_rows(version=0) == 8
    # the descriptors materialized as graft-native sidecars
    snap = t.snapshot()
    dv_files = [f for f in snap.files if f.dv_path]
    assert len(dv_files) == 1 and dv_files[0].dv_count == 3


def test_dv_import_then_maintenance_verbs(spark, tmp_path):
    """Imported DVs must behave exactly like native ones downstream:
    REORG PURGE rewrites the DV-carrying file and contents survive."""
    from delta_lake_optimizations_spark.table.maintenance import reorg_purge

    root = str(tmp_path / "delta_dv_maint")
    _make_dv_delta_table(root)
    t = convert_from_delta(spark, root)
    before = sorted(r["id"] for r in t.load().collect())
    reorg_purge(t)
    snap = t.snapshot()
    assert not any(f.dv_count for f in snap.files)
    assert sorted(r["id"] for r in t.load().collect()) == before


def test_dv_import_refuses_corrupt_descriptors(spark, tmp_path):
    """Cardinality mismatch and truncated sidecars refuse loudly instead
    of resurrecting rows."""
    import uuid as _uuid

    from delta_lake_optimizations_spark.table import roaring

    root = str(tmp_path / "delta_dv_bad")
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    a0 = _write_part(root, "part-00000-bad.snappy.parquet",
                     [1, 2, 3], ["US"] * 3, [1.0, 2.0, 3.0])
    u = _uuid.uuid4()
    dv_file = os.path.join(root, f"deletion_vector_{u}.bin")
    blob = roaring.serialize_dv_blob([0])
    (off, size), = roaring.write_dv_file(dv_file, [blob])
    a0_dv = {**a0, "deletionVector": {
        "storageType": "u", "pathOrInlineDv": roaring.z85_encode(u.bytes),
        "offset": off, "sizeInBytes": size, "cardinality": 99,  # lies
    }}
    _commit(log, 0, [
        {"commitInfo": {"timestamp": _TS0, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta_action(_SCHEMA_V0),
        {"add": a0_dv},
    ])
    with pytest.raises(UnsupportedDeltaFeature, match="cardinality"):
        convert_from_delta(spark, root)
