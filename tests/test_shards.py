"""Tar-shard export/import: round-trip fidelity, deterministic bytes,
binary payloads, manifest accounting."""

from __future__ import annotations

import hashlib
import os
import tarfile

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.sources.shards import (
    export_tar_shards,
    read_tar_shards,
)

from .conftest import SF_DIR


def test_export_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "shards")
    manifest = export_tar_shards(
        docs,
        out,
        key_col="doc_id",
        text_cols={"text": "txt", "lang": "lang"},
        n_shards=4,
    ).collect()

    n_docs = docs.count()
    assert sum(m["n_samples"] for m in manifest) == n_docs
    assert len(manifest) <= 4 and all(m["n_bytes"] > 0 for m in manifest)
    assert all(os.path.exists(m["path"]) for m in manifest)

    back = read_tar_shards(spark, out)
    texts = {
        r["key"]: r["content"].decode("utf-8")
        for r in back.filter(F.col("ext") == "txt").collect()
    }
    want = {str(r["doc_id"]): r["text"] for r in docs.collect()}
    assert texts == want
    # two members per sample (txt + lang)
    assert back.count() == 2 * n_docs


def test_export_bytes_are_deterministic(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)

    def digest(d: str) -> dict[str, str]:
        export_tar_shards(docs, d, key_col="doc_id", text_cols={"text": "txt"}, n_shards=3)
        out = {}
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = hashlib.sha256(fh.read()).hexdigest()
        return out

    a = digest(str(tmp_path / "a"))
    b = digest(str(tmp_path / "b"))
    assert a == b and len(a) >= 1


def test_export_binary_payloads(spark, tmp_path):
    rows = [(i, f"meta{i}", bytes([i % 256]) * (i + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, ["sample_id", "meta", "payload"])
    out = str(tmp_path / "bin")
    export_tar_shards(
        df,
        out,
        key_col="sample_id",
        text_cols={"meta": "json"},
        binary_cols={"payload": "bin"},
        n_shards=2,
    )
    back = read_tar_shards(spark, out)
    payloads = {
        int(r["key"]): bytes(r["content"])
        for r in back.filter(F.col("ext") == "bin").collect()
    }
    assert payloads == {i: bytes([i % 256]) * (i + 1) for i in range(50)}


def test_samples_stay_grouped_within_shard(spark, tmp_path):
    """WebDataset contract: all members of a sample are contiguous."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang").limit(100)
    out = str(tmp_path / "grp")
    export_tar_shards(
        docs, out, key_col="doc_id",
        text_cols={"text": "txt", "lang": "lang"}, n_shards=2,
    )
    for f in os.listdir(out):
        with tarfile.open(os.path.join(out, f)) as tar:
            names = [i.name for i in tar if i.isfile()]
        keys = [n.rpartition(".")[0] for n in names]
        seen: set[str] = set()
        prev = None
        for k in keys:
            if k != prev:
                assert k not in seen, f"sample {k} split across positions"
                seen.add(k)
                prev = k


def test_null_columns_skip_members(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, "fr")], ["k", "text", "lang"]
    )
    out = str(tmp_path / "nulls")
    export_tar_shards(
        df, out, key_col="k", text_cols={"text": "txt", "lang": "lang"}, n_shards=1
    )
    back = read_tar_shards(spark, out).collect()
    members = {r["member"] for r in back}
    assert members == {"1.txt", "2.lang"}
