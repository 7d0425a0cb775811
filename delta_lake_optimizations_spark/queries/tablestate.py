"""Driver-window queries riding the round-11 table machinery.

Two oracle-backed rows that exercise paths the r11 work rebuilt, so the
driver's side-by-side DuckDB gate (not just pytest) pins them every
round:

- ``table_checkpoint_pruned_scan`` — a GraftTable written across enough
  commits to cross the checkpoint interval, re-opened on a FRESH handle
  (so the snapshot comes from the COLUMNAR parquet checkpoint,
  ``table/checkpoint_arrow.py``) and range-scanned through the
  vectorized stats prune + exactness re-filter. The oracle restates the
  range over the raw corpus: any prune that drops a live file loses
  rows; any replay bug duplicates them.
- ``delta_dv_import_ids`` — a protocol-conformant Delta log built
  in-query (real parquet, protocol 3/7 with the deletionVectors reader
  feature, a sidecar 'u' DV written by ``table/roaring.py``) imported
  via ``convert_from_delta``; the result is the post-delete table. The
  oracle states the kept set over the raw corpus — resurrected rows or
  over-deletes both fail rows_match.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


@query(
    "table_checkpoint_pruned_scan",
    tags=("table", "metadata", "scale"),
    oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE doc_id >= 100 AND doc_id < 160
    """,
)
def table_checkpoint_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents into a GraftTable over 12 commits (checkpoint
    lands at v10), reopen on a fresh handle — the snapshot is now the
    columnar parquet checkpoint plus a vectorized tail replay — and
    range-scan with ``skip_where`` so the arrow stats prune picks the
    files. r11 regression anchor for ``table/checkpoint_arrow.py``."""
    from delta_lake_optimizations_spark.table import GraftTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    root = os.path.join(tempfile.mkdtemp(prefix="graft_ckscan_"), "t")
    t = GraftTable(spark, root)
    # 12 slices by doc_id band keep per-file min/max ranges TIGHT (a
    # modulo split would give every file the full range and nothing
    # would prune)
    n_slices = 12
    hi = docs.agg(F.max("doc_id")).collect()[0][0] or 0
    band = max(1, (int(hi) + n_slices) // n_slices)
    for i in range(n_slices):
        part = docs.filter(
            (F.col("doc_id") >= i * band) & (F.col("doc_id") < (i + 1) * band)
        ).coalesce(1)
        t.write(part, mode="overwrite" if i == 0 else "append")
    fresh = GraftTable(spark, root)  # cold handle: checkpoint-backed
    assert fresh.snapshot().files_arrow is not None
    return fresh.load(
        skip_where=[("doc_id", ">=", 100), ("doc_id", "<", 160)]
    ).select("doc_id", "lang")


@query(
    "delta_dv_import_ids",
    tags=("table", "interop", "dv"),
    oracle="""
        SELECT doc_id
        FROM documents
        WHERE doc_id < 80 AND doc_id % 7 <> 3
    """,
)
def delta_dv_import_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a real Delta table (parquet + _delta_log) whose v1 carries a
    deletion vector marking every ``doc_id % 7 == 3`` row, import it with
    ``convert_from_delta``, and return the surviving ids. r11 regression
    anchor for the DV bitstream decode (``table/roaring.py``) and the
    import-side materialization."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as papq

    from delta_lake_optimizations_spark.table import roaring
    from delta_lake_optimizations_spark.table.delta_import import (
        convert_from_delta,
    )

    ids = sorted(
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select("doc_id")
        .collect()
    )
    root = os.path.join(tempfile.mkdtemp(prefix="graft_dvimp_"), "dvt")
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    data_name = "part-00000-dv.snappy.parquet"
    papq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        os.path.join(root, data_name),
    )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "doc_id", "type": "long", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    add = {
        "path": data_name,
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(root, data_name)),
        "modificationTime": 1_700_000_000_000,
        "dataChange": True,
        "stats": json.dumps(
            {"numRecords": len(ids),
             "minValues": {"doc_id": ids[0] if ids else 0},
             "maxValues": {"doc_id": ids[-1] if ids else 0},
             "nullCount": {"doc_id": 0}}
        ),
    }

    def commit(v: int, actions: list[dict]) -> None:
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    commit(0, [
        {"commitInfo": {"timestamp": 1_700_000_000_000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {
            "id": "22222222-3333-4444-5555-666666666666",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1_700_000_000_000,
        }},
        {"add": add},
    ])
    positions = [i for i, d in enumerate(ids) if d % 7 == 3]
    u = _uuid.uuid4()
    (off, size), = roaring.write_dv_file(
        os.path.join(root, f"deletion_vector_{u}.bin"),
        [roaring.serialize_dv_blob(positions)],
    )
    commit(1, [
        {"commitInfo": {"timestamp": 1_700_000_001_000,
                        "operation": "DELETE"}},
        {"remove": {"path": data_name,
                    "deletionTimestamp": 1_700_000_001_000,
                    "dataChange": True}},
        {"add": {**add, "deletionVector": {
            "storageType": "u",
            "pathOrInlineDv": roaring.z85_encode(u.bytes),
            "offset": off, "sizeInBytes": size,
            "cardinality": len(positions),
        }}},
    ])
    t = convert_from_delta(spark, root)
    return t.load().select("doc_id")
