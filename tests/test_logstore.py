"""LogStore seam (table/logstore.py — VERDICT r09 #3): the commit
protocol's atomic put-if-absent primitive must hold on POSIX (link(2))
AND under object-store semantics (no links, no renames — a conditional
PUT modeled by an O_EXCL claim), with exactly one winner per version
and readers tolerant of the local double's in-flight window."""

from __future__ import annotations

import json
import os
import threading

import pytest

from delta_lake_optimizations_spark.table.graft_table import (
    ConcurrentCommitError,
    GraftTable,
)
from delta_lake_optimizations_spark.table.logstore import (
    ConditionalPutLogStore,
    HardLinkLogStore,
    log_store,
)


@pytest.fixture(params=["hardlink", "conditional_put"])
def backend(request, monkeypatch):
    monkeypatch.setenv("GRAFT_LOGSTORE", request.param)
    return request.param


def test_env_selects_backend(backend):
    expected = {
        "hardlink": HardLinkLogStore,
        "conditional_put": ConditionalPutLogStore,
    }[backend]
    assert isinstance(log_store(), expected)


def test_unknown_backend_refused(monkeypatch):
    monkeypatch.setenv("GRAFT_LOGSTORE", "dynamo")
    with pytest.raises(ValueError, match="unknown backend"):
        log_store()


def test_put_if_absent_exactly_one_winner(backend, tmp_path):
    """32 threads race one version file; exactly one put succeeds and the
    published payload is one loser-free winner's, complete."""
    final = str(tmp_path / "00000000001.json")
    store = log_store()
    wins: list[int] = []
    barrier = threading.Barrier(32)

    def attempt(i: int) -> None:
        barrier.wait()
        try:
            store.put_if_absent(final, json.dumps({"writer": i}))
            wins.append(i)
        except FileExistsError:
            pass

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert json.loads(store.read_text(final)) == {"writer": wins[0]}
    # no staging debris beside the published commit
    assert os.listdir(tmp_path) == ["00000000001.json"]


def test_conditional_put_reader_rides_through_inflight_write(tmp_path):
    """The local double's claim->write window: a reader that catches the
    claimed-but-unwritten file retries until the writer's bytes land."""
    store = ConditionalPutLogStore()
    final = str(tmp_path / "00000000002.json")
    fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)  # claim only

    def finish() -> None:
        os.write(fd, b'{"ok": true}')
        os.close(fd)

    t = threading.Timer(0.15, finish)
    t.start()
    try:
        assert json.loads(store.read_text(final)) == {"ok": True}
    finally:
        t.join()


def test_conditional_put_reader_gives_up_on_crashed_writer(tmp_path):
    store = ConditionalPutLogStore()
    final = str(tmp_path / "00000000003.json")
    os.close(os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(ValueError, match="never became parseable"):
        store.read_text(final)


def test_graft_commits_and_conflicts_under_either_backend(
    backend, spark, tmp_path
):
    """Full table semantics ride the seam: appends commit, blind appends
    rebase past a moved head, stale non-append writers still lose."""
    t = GraftTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t.write(df)
    t.write(df, mode="append")
    assert t.load().count() == 4

    # blind append computed against v0 rebases onto the moved head
    snap0 = t.snapshot(version=0)
    adds = t.snapshot().files[:1]
    c = t._write_commit("TEST APPEND", {}, list(adds), [], base_version=snap0.version)
    assert c.version == t.latest_version()

    # a remove computed from a stale snapshot must not rebase
    stale = t.snapshot(version=0)
    with pytest.raises(ConcurrentCommitError):
        t._write_commit(
            "TEST REMOVE",
            {},
            [],
            [stale.files[0].path],
            base_version=stale.version,
        )

    # history replays cleanly through the backend's read path
    assert [cm.version for cm in t.commits()] == list(
        range(t.latest_version() + 1)
    )


def test_conditional_put_short_write_loops_to_completion(tmp_path, monkeypatch):
    """ADVICE r10: os.write may write fewer bytes than asked; a short
    write must not publish a truncated commit file. Simulate a kernel
    that writes at most 7 bytes per call and require the full payload."""
    from delta_lake_optimizations_spark.table import logstore as ls

    real_write = os.write

    def short_write(fd, data):
        return real_write(fd, data[:7])

    monkeypatch.setattr(ls.os, "write", short_write)
    store = ls.ConditionalPutLogStore()
    final = str(tmp_path / "00000000000.json")
    payload = json.dumps({"version": 0, "junk": "x" * 200})
    store.put_if_absent(final, payload)
    assert open(final).read() == payload


def test_conditional_put_failed_write_unlinks_claim(tmp_path, monkeypatch):
    """A write failure mid-payload must unlink the claimed file so another
    writer can retry the version instead of finding a wedged truncated
    commit."""
    from delta_lake_optimizations_spark.table import logstore as ls

    real_write = os.write
    calls = {"n": 0}

    def failing_write(fd, data):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError(28, "No space left on device")
        return real_write(fd, data[:7])

    monkeypatch.setattr(ls.os, "write", failing_write)
    store = ls.ConditionalPutLogStore()
    final = str(tmp_path / "00000000000.json")
    with pytest.raises(OSError):
        store.put_if_absent(final, json.dumps({"version": 0, "junk": "y" * 200}))
    assert not os.path.exists(final)  # claim released — version retryable
