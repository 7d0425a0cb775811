"""FingerprintStore: incremental exact dedup against unbounded history
(operators/incremental_dedup.py). Oracle value-parity for the registered
two-batch query is in tests/test_oracle_parity.py."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.incremental_dedup import (
    FingerprintStore,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_and_intra_batch_dedup(spark, tmp_path):
    store = FingerprintStore(spark, os.path.join(tmp_path, "fp"))

    b0 = _batch(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups 1
    kept0 = sorted(r["doc_id"] for r in store.ingest(b0, "b0").collect())
    assert kept0 == [1, 2], "intra-batch: lowest id per content survives"

    b1 = _batch(spark, [(4, "beta"), (5, "gamma"), (6, "alpha")])
    kept1 = sorted(r["doc_id"] for r in store.ingest(b1, "b1").collect())
    assert kept1 == [5], "cross-batch: only unseen content survives"

    fps = store.fingerprints()
    assert fps.count() == 3  # alpha, beta, gamma
    assert set(r["batch"] for r in fps.collect()) == {"b0", "b1"}


def test_replay_is_exactly_once(spark, tmp_path):
    store = FingerprintStore(spark, os.path.join(tmp_path, "fp"))
    b0 = _batch(spark, [(1, "alpha"), (2, "beta")])
    store.ingest(b0, "b0").collect()
    b1 = _batch(spark, [(3, "beta"), (4, "gamma")])
    first = sorted(r["doc_id"] for r in store.ingest(b1, "b1").collect())
    n_commits = len(store.table.commits())

    replay = sorted(r["doc_id"] for r in store.ingest(b1, "b1").collect())
    assert replay == first == [4], "replay returns the original survivors"
    assert len(store.table.commits()) == n_commits, "replay must not commit"
    assert store.fingerprints().count() == 3


def test_survivor_frame_is_snapshot_pinned(spark, tmp_path):
    """The DataFrame ingest() returns is pinned to the PRE-append store
    snapshot: collecting it after the append (and after later batches)
    still yields the batch's survivors, not an anti-join against a store
    that now contains them."""
    store = FingerprintStore(spark, os.path.join(tmp_path, "fp"))
    store.ingest(_batch(spark, [(1, "alpha")]), "b0").collect()
    kept = store.ingest(_batch(spark, [(2, "beta"), (3, "gamma")]), "b1")
    store.ingest(_batch(spark, [(9, "delta")]), "b2").collect()
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_contains_probe_prunes_files(spark, tmp_path):
    """fp is a uniform hash — min/max ranges can never prune it — so
    point membership probes must ride the auto-built BLOOM sidecar: an
    absent fingerprint scans ZERO files, a present one scans fewer files
    than the store holds."""
    store = FingerprintStore(spark, os.path.join(tmp_path, "fp"))
    rows = [(i, f"text-{i}") for i in range(2000)]
    for b in range(4):
        store.ingest(
            _batch(spark, rows[b * 500 : (b + 1) * 500]).repartition(4), str(b)
        ).collect()
    total = len(store.table.snapshot().files)
    assert total >= 4  # one file per batch at minimum
    one = store.fingerprints().select("fp").first()["fp"]
    scanned = store.table.files_scanned(skip_where=[("fp", "in", [one])])
    assert scanned < total, f"probe read {scanned}/{total} files"
    assert store.contains([one]).count() == 1
    absent = "0" * 64
    assert store.table.files_scanned(skip_where=[("fp", "in", [absent])]) == 0
    assert store.contains([absent]).count() == 0


def test_streaming_dedup_ingest_sink(spark, tmp_path):
    """The streaming face of the fingerprint store: micro-batches of
    overlapping docs flow through the dedup-ingest sink; the clean table
    ends up with exactly the novel-content survivors, and a full replay
    over a fresh checkpoint (same batches) changes nothing."""
    import os

    from delta_lake_optimizations_spark.streaming.graft_sink import (
        write_stream_dedup_ingest,
    )
    from delta_lake_optimizations_spark.table import GraftTable

    src = os.path.join(tmp_path, "src")
    # two files -> two micro-batches (maxFilesPerTrigger=1); batch b
    # overlaps batch a in content
    _batch(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")]).coalesce(1).write.parquet(
        os.path.join(src, "a")
    )
    _batch(spark, [(4, "beta"), (5, "gamma")]).coalesce(1).write.parquet(
        os.path.join(src, "b")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    store = FingerprintStore(spark, os.path.join(tmp_path, "fp"))
    clean = GraftTable(spark, os.path.join(tmp_path, "clean"))
    q = write_stream_dedup_ingest(stream, store, clean, os.path.join(tmp_path, "ck"))
    q.awaitTermination(180)

    texts = sorted(r["text"] for r in clean.load().collect())
    assert texts == ["alpha", "beta", "gamma"]
    assert store.fingerprints().count() == 3

    # replay everything with a fresh checkpoint: both tables unchanged
    n_clean_commits = len(clean.commits())
    q2 = write_stream_dedup_ingest(stream, store, clean, os.path.join(tmp_path, "ck2"))
    q2.awaitTermination(180)
    assert sorted(r["text"] for r in clean.load().collect()) == texts
    assert store.fingerprints().count() == 3
    assert len(clean.commits()) == n_clean_commits
