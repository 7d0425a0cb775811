"""Training-shard export/import: WebDataset-style tar shards.

Large-scale training loaders stream samples from sharded tar archives
(the public WebDataset convention: each sample is a group of
``{key}.{ext}`` members stored contiguously in a ``.tar``; shards are
the unit of shuffling and of loader parallelism). This module exports a
DataFrame — text, JSON metadata, and opaque binary payload columns — to
such shards, and reads them back for inspection.

Scale design (100 TB):

- Shard assignment is a deterministic hash of the sample key
  (``pmod(xxhash64(key), n_shards)``) — reproducible across cluster
  sizes and restarts with zero RNG state, and it pre-shuffles samples
  across shards, which is exactly what sequential training readers want.
- One shuffle total: ``repartition(n_shards, shard)`` co-locates each
  shard's rows in exactly one task, then ``sortWithinPartitions`` fixes
  a canonical sample order, so shard bytes are bit-reproducible
  (members are written with zeroed mtime/uid/gid).
- Tars are written executor-side inside ``mapInPandas`` (Arrow batches
  stream through a per-shard open tarfile); the driver receives only
  the manifest — one row per shard — never sample data.
- Import goes through Spark's ``binaryFile`` source plus a
  ``mapInPandas`` member expander: each task unpacks whole shards, so
  reading N shards parallelizes N-wide with no driver involvement.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("shard", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def export_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    text_cols: dict[str, str] | None = None,
    binary_cols: dict[str, str] | None = None,
    n_shards: int = 8,
    prefix: str = "shard",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` WebDataset-style tar shards.

    ``text_cols``/``binary_cols`` map column name → member extension,
    e.g. ``{"text": "txt"}`` + ``{"payload": "jpg"}`` emits members
    ``{key}.txt`` and ``{key}.jpg`` per row. Returns the manifest
    DataFrame (shard, path, n_samples, n_bytes) — the only thing that
    ever reaches the driver.
    """
    text_cols = dict(text_cols or {})
    binary_cols = dict(binary_cols or {})
    if not text_cols and not binary_cols:
        raise ValueError("need at least one of text_cols / binary_cols")
    exts = list(text_cols.values()) + list(binary_cols.values())
    if len(set(exts)) != len(exts):
        raise ValueError(f"duplicate member extensions: {exts}")
    os.makedirs(out_dir, exist_ok=True)

    width = max(5, len(str(n_shards - 1)))
    cols = [key_col, *text_cols.keys(), *binary_cols.keys()]
    prepared = (
        df.select(
            F.col(key_col).cast("string").alias("__key"),
            *[F.col(c).cast("string").alias(c) for c in text_cols],
            *[F.col(c).cast("binary").alias(c) for c in binary_cols],
        )
        .withColumn(
            "__shard", F.pmod(F.xxhash64(F.col("__key")), F.lit(n_shards)).cast("int")
        )
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__key")
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        open_tars: dict[int, tuple[str, tarfile.TarFile]] = {}
        counts: dict[int, int] = {}

        def member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # reproducible bytes
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(data))

        for pdf in batches:
            # (not itertuples: pandas renames dunder-prefixed columns there)
            for r in pdf.to_dict("records"):
                sid = int(r["__shard"])
                if sid not in open_tars:
                    name = f"{prefix}-{sid:0{width}d}.tar"
                    path = os.path.join(out_dir, name)
                    open_tars[sid] = (path, tarfile.open(path, "w"))
                    counts[sid] = 0
                _, tar = open_tars[sid]
                key = r["__key"]
                for col, ext in text_cols.items():
                    v = r[col]
                    if v is not None:
                        member(tar, f"{key}.{ext}", str(v).encode("utf-8"))
                for col, ext in binary_cols.items():
                    v = r[col]
                    if v is not None:
                        member(tar, f"{key}.{ext}", bytes(v))
                counts[sid] += 1
        rows = []
        for sid, (path, tar) in open_tars.items():
            tar.close()
            rows.append(
                {
                    "shard": os.path.basename(path),
                    "path": path,
                    "n_samples": counts[sid],
                    "n_bytes": os.path.getsize(path),
                }
            )
        yield pd.DataFrame(
            rows, columns=["shard", "path", "n_samples", "n_bytes"]
        )

    manifest = prepared.mapInPandas(write_partition, schema=_MANIFEST_SCHEMA)
    # materialize once so the export runs exactly one job; hand back the
    # (tiny) manifest as a fresh local DataFrame
    rows = manifest.collect()
    spark = df.sparkSession
    return spark.createDataFrame(rows, schema=_MANIFEST_SCHEMA)


def read_tar_shards(spark: SparkSession, shards_dir: str) -> DataFrame:
    """Expand tar shards back into one row per member:
    (key, ext, member, shard, content). Whole shards unpack executor-side
    via binaryFile + mapInPandas; add ``.filter(ext == 'txt')`` etc.
    before wide operations to prune early."""
    files = spark.read.format("binaryFile").load(
        os.path.join(shards_dir, "*.tar")
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for row in pdf.itertuples(index=False):
                shard = os.path.basename(str(row.path))
                with tarfile.open(fileobj=io.BytesIO(row.content)) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        data = tar.extractfile(info).read()
                        key, dot, ext = info.name.rpartition(".")
                        out.append(
                            {
                                "key": key if dot else info.name,
                                "ext": ext if dot else "",
                                "member": info.name,
                                "shard": shard,
                                "content": data,
                            }
                        )
            yield pd.DataFrame(
                out, columns=["key", "ext", "member", "shard", "content"]
            )

    return files.select("path", "content").mapInPandas(expand, schema=_SAMPLE_SCHEMA)
