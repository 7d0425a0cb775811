"""Commit-file atomicity backends — the LogStore seam (VERDICT r09 #3).

The graft log's entire concurrency story rests on ONE primitive:
*publish commit file N iff absent, exactly one winner* (optimistic
concurrency, ``graft_table.py::_write_commit``). On a POSIX filesystem
``link(2)`` provides it natively. Object stores — the storage a real
100 TB deployment runs on — have **no hard links and no atomic
rename**, but every major one now exposes an atomic **conditional
put** of a complete object:

- S3 ``PutObject`` with ``If-None-Match: *`` (natively since 2024;
  before that, Delta's S3DynamoDBLogStore emulated it with an external
  coordination table — same contract, rented primitive);
- GCS ``x-goog-if-generation-match: 0``;
- Azure ADLS/ABFS conditional create (ETag ``If-None-Match: *``).

Public Delta Lake solves this with the same seam (``LogStore`` /
``delta.logStore.<scheme>.impl``); this module is that seam for the
graft log. Two backends:

- ``HardLinkLogStore`` (default): temp file + ``link(2)`` — the
  historical behavior, byte-for-byte.
- ``ConditionalPutLogStore``: models the object-store primitive with
  NO links and NO renames — a single ``O_CREAT|O_EXCL`` claim of the
  final name, payload written into the claimed fd. A REAL conditional
  put is all-or-nothing (the object is either absent or complete); the
  local double necessarily exposes a tiny claim->write window, so its
  ``read_text`` retries through unparseable in-flight reads — readers
  built on it are therefore correct under semantics strictly WEAKER
  than any real object store provides.

Backend selection rides the ``GRAFT_LOGSTORE`` environment variable
(``hardlink`` | ``conditional_put``) so multi-process race tests can
pin a backend per interpreter — the production analogue is choosing an
implementation per storage scheme, exactly like Delta's
``logStore.<scheme>.impl``.

Listings (``_versions``) stay plain directory lists in both backends:
S3/GCS/ABFS all guarantee strong list-after-write consistency for new
objects (S3 since 2020), so a committed version is visible to the next
listing — the property the optimistic retry loop needs.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class HardLinkLogStore:
    """POSIX backend: stage beside the target, publish via ``link(2)``.

    ``link`` fails with ``FileExistsError`` if another writer already
    holds the name, and the published name refers to a COMPLETE file
    (the bytes were staged first) — both halves of the contract in one
    syscall."""

    name = "hardlink"

    def put_if_absent(self, final: str, payload: str) -> None:
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        try:
            os.link(tmp, final)
        finally:
            os.unlink(tmp)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()


class ConditionalPutLogStore:
    """Object-store-semantics backend: no links, no renames.

    ``put_if_absent`` claims the final name with ``O_CREAT|O_EXCL``
    (the local stand-in for a conditional PUT's atomic create) and
    writes the payload into the claimed fd. Exactly-one-winner holds
    identically to the hard-link backend; what the local double cannot
    reproduce is the real primitive's all-or-nothing visibility, so
    ``read_text`` treats an empty/unparseable commit file as in-flight
    and retries briefly before giving up — against a real object store
    those retries simply never trigger."""

    name = "conditional_put"

    _READ_RETRIES = (0.01, 0.05, 0.2, 0.5, 1.0)

    def put_if_absent(self, final: str, payload: str) -> None:
        fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        try:
            data = payload.encode("utf-8")
            # os.write may write fewer bytes than asked (ADVICE r10:
            # near-ENOSPC a short write would publish a truncated commit
            # file readers can never parse, wedging this version) — loop
            # to completion and unlink the claimed name on any failure so
            # another writer can retry the version.
            written = 0
            while written < len(data):
                written += os.write(fd, data[written:])
            os.fsync(fd)
        except BaseException:
            os.close(fd)
            os.unlink(final)
            raise
        os.close(fd)

    def read_text(self, path: str) -> str:
        last_err: Exception | None = None
        for delay in self._READ_RETRIES:
            with open(path) as fh:
                text = fh.read()
            if text:
                try:
                    json.loads(text)
                    return text
                except ValueError as e:  # mid-write snapshot of the double
                    last_err = e
            time.sleep(delay)
        raise ValueError(
            f"commit file {path} never became parseable — a crashed writer "
            "left a claimed-but-unwritten commit (object-store analogue: a "
            "conditional PUT that was acknowledged can never be partial, so "
            "this state is unreachable there)"
        ) from last_err


_BACKENDS = {
    HardLinkLogStore.name: HardLinkLogStore,
    ConditionalPutLogStore.name: ConditionalPutLogStore,
}


def log_store() -> HardLinkLogStore | ConditionalPutLogStore:
    """Resolve the active backend from ``GRAFT_LOGSTORE`` (default
    ``hardlink``). Read per call so a test — or a worker process spawned
    by one — can flip backends without rebuilding table handles."""
    name = os.environ.get("GRAFT_LOGSTORE", HardLinkLogStore.name)
    try:
        return _BACKENDS[name]()
    except KeyError:
        raise ValueError(
            f"GRAFT_LOGSTORE={name!r}: unknown backend "
            f"(choose from {sorted(_BACKENDS)})"
        ) from None
