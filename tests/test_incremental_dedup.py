"""FingerprintStore: incremental exact dedup against unbounded history
(operators/incremental_dedup.py). Oracle value-parity for the registered
two-batch query is in tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest

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


# ---------------------------------------------------------------------------
# Serializable-ingest concurrency (VERDICT r06 #5): the documented
# double-admit window — two concurrent batches both containing the same NEW
# fingerprint — must be closed: exactly one admits it.
# ---------------------------------------------------------------------------


def test_serializable_write_rejects_moved_head(spark, tmp_path):
    """Both layers of the guard, deterministically: (a) expected_version
    catches a head that moved BEFORE write() starts; (b) no_rebase turns
    the link(2) collision inside the commit window into a conflict even
    for a mechanically rebase-safe blind append."""
    import pytest

    from delta_lake_optimizations_spark.table import GraftTable
    from delta_lake_optimizations_spark.table.graft_table import (
        AddFile,
        ConcurrentCommitError,
    )

    t = GraftTable(spark, os.path.join(tmp_path, "t"))
    t.write(spark.range(5).toDF("id"))
    ver = t.latest_version()
    t.write(spark.range(5).toDF("id"), mode="append")  # head moves

    with pytest.raises(ConcurrentCommitError, match="moved past"):
        t.write(
            spark.range(5).toDF("id"), mode="append",
            serializable=True, expected_version=ver,
        )

    # same stale base inside the commit protocol: default blind append
    # rebases and lands; no_rebase raises instead
    add = [AddFile(path="data/x.parquet", size=1, num_records=1)]
    with pytest.raises(ConcurrentCommitError):
        t._write_commit("A", {}, add, [], base_version=ver, no_rebase=True)
    c = t._write_commit("A", {}, add, [], base_version=ver)
    assert c.version == t.latest_version()


def test_conflicting_ingest_rederives_and_admits_once(spark, tmp_path):
    """Deterministic interleaving of the exact race the store documents:
    a rival batch containing the same NEW fingerprint commits in the
    window between this ingest's derivation and its append. The
    serializable commit must fail the stale attempt, the retry must
    re-derive against the rival's head, and the shared fingerprint must
    be admitted exactly once (by the rival)."""
    path = os.path.join(tmp_path, "fp")
    store = FingerprintStore(spark, path)
    store.ingest(_batch(spark, [(1, "alpha")]), "b0").collect()

    rival = FingerprintStore(spark, path)
    orig_write = store.table.write
    injected = {"done": False}

    def write_with_rival(*a, **kw):
        if not injected["done"]:
            injected["done"] = True
            rival.ingest(
                _batch(spark, [(50, "shared-new"), (51, "rival-only")]), "rb"
            ).collect()
        return orig_write(*a, **kw)

    store.table.write = write_with_rival
    kept = sorted(
        r["doc_id"]
        for r in store.ingest(
            _batch(spark, [(60, "shared-new"), (61, "mine-only")]), "b1"
        ).collect()
    )
    assert injected["done"], "rival commit must have been injected"
    assert kept == [61], "shared fingerprint belongs to the rival's batch"
    fps = store.fingerprints()
    assert fps.count() == 4  # alpha, shared-new, rival-only, mine-only
    assert fps.select("fp").distinct().count() == 4, "no double admission"
    owner = fps.filter(F.col("id") == 50).first()
    assert owner is not None and owner["batch"] == "rb"


def _race_ingest_worker(args):
    """Real-process worker: own SparkSession (spawn — no inherited JVM),
    rendezvous on the filesystem so both ingests enter the critical
    section together, then ingest a batch containing one unique text and
    one text SHARED with the other worker."""
    path, rendezvous, worker_id, *rest = args
    import os
    import sys
    import time

    if rest:  # optional logstore backend (VERDICT r09 #3: object-store race)
        os.environ["GRAFT_LOGSTORE"] = rest[0]
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"fpstore-race-{worker_id}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from delta_lake_optimizations_spark.operators.incremental_dedup import (
            FingerprintStore,
        )

        store = FingerprintStore(spark, path)
        batch = spark.createDataFrame(
            [
                (worker_id, f"unique-{worker_id}"),
                (100 + worker_id, "shared-between-batches"),
            ],
            "doc_id long, text string",
        )
        open(os.path.join(rendezvous, f"ready-{worker_id}"), "w").close()
        deadline = time.time() + 120
        while len(os.listdir(rendezvous)) < 2:
            if time.time() > deadline:
                raise TimeoutError("rendezvous partner never arrived")
            time.sleep(0.01)
        kept = sorted(
            r["doc_id"] for r in store.ingest(batch, f"b{worker_id}").collect()
        )
        return (worker_id, kept)
    finally:
        spark.stop()


@pytest.mark.slow  # two-process race rigs
def test_two_process_race_admits_shared_fingerprint_once(spark, tmp_path):
    """Two REAL OS processes (fresh interpreters, own JVMs) ingest
    concurrent batches that both contain the same brand-new text — they
    also race the store's CREATION. Every unique text must land, and the
    shared text must be admitted by EXACTLY one batch, whichever
    interleaving the scheduler produced."""
    import multiprocessing as mp

    path = os.path.join(tmp_path, "fp")
    rendezvous = os.path.join(tmp_path, "rdv")
    os.makedirs(rendezvous)

    ctx = mp.get_context("spawn")
    with ctx.Pool(2) as pool:
        results = dict(
            pool.map(_race_ingest_worker, [(path, rendezvous, i) for i in (1, 2)])
        )

    admitted_shared = [w for w in (1, 2) if 100 + w in results[w]]
    assert len(admitted_shared) == 1, f"shared text admitted by {admitted_shared}"
    for w in (1, 2):
        assert w in results[w], f"unique text of worker {w} lost"

    store = FingerprintStore(spark, path)
    fps = store.fingerprints()
    assert fps.count() == 3  # unique-1, unique-2, shared (once)
    assert fps.select("fp").distinct().count() == 3
    assert store.ingested_batches() == {"b1", "b2"}


@pytest.mark.slow  # two-process race rigs
def test_two_process_race_under_conditional_put_logstore(spark, tmp_path):
    """The SAME two-process serializability race, with both writers'
    commit protocol pinned to the object-store backend (VERDICT r09 #3:
    no hard links, no atomic rename — an O_EXCL claim standing in for a
    conditional PUT). The FingerprintStore's exactly-once admission must
    hold on storage with only that primitive."""
    import multiprocessing as mp

    path = os.path.join(tmp_path, "fp_cp")
    rendezvous = os.path.join(tmp_path, "rdv_cp")
    os.makedirs(rendezvous)

    ctx = mp.get_context("spawn")
    with ctx.Pool(2) as pool:
        results = dict(
            pool.map(
                _race_ingest_worker,
                [(path, rendezvous, i, "conditional_put") for i in (1, 2)],
            )
        )

    admitted_shared = [w for w in (1, 2) if 100 + w in results[w]]
    assert len(admitted_shared) == 1, f"shared text admitted by {admitted_shared}"
    for w in (1, 2):
        assert w in results[w], f"unique text of worker {w} lost"

    store = FingerprintStore(spark, path)
    fps = store.fingerprints()
    assert fps.count() == 3
    assert fps.select("fp").distinct().count() == 3
    assert store.ingested_batches() == {"b1", "b2"}
