"""Delta deletion-vector bitstream codec: Z85 + 64-bit RoaringBitmapArray.

VERDICT r10 #2: modern Delta writers enable deletion vectors by default,
so ``CONVERT FROM DELTA`` refused exactly the tables users most want to
migrate. This module implements, from the PUBLIC specs alone, everything
needed to read (and, for fixtures/tests, write) the on-disk DV format:

- **Z85** (ZeroMQ RFC 32, https://rfc.zeromq.org/spec/32/): 4 bytes ->
  5 chars, big-endian base-85 over a fixed 85-char alphabet. Delta uses
  it for DV file UUIDs (16 bytes -> 20 chars) and inline DVs.
- **32-bit RoaringBitmap portable serialization**
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12347
  (no run containers, + i32 container count) or 12346 (run containers;
  count-1 in the cookie's upper 16 bits, then a run bitset), a
  descriptive header of (key u16, cardinality-1 u16) pairs, an optional
  offset header, then array (u16 values) / bitmap (8 KiB) / run
  (count + (start, length) pairs) containers. The reader parses
  sequentially and accepts both cookies; the writer emits the simpler
  12347 form (array/bitmap containers only) unless asked for runs.
- **RoaringBitmapArray "portable" format + Delta DV blob** (Delta
  PROTOCOL.md, Deletion Vectors): blob = magic 1681511377 (i32 LE)
  + number of 32-bit bitmaps (i64 LE) + per bitmap its i32 LE key (the
  row index's high 32 bits, strictly increasing) + the standard 32-bit
  portable bytes. A DV FILE is ``[version byte = 1]`` then, at each
  descriptor's ``offset``: ``[dataSize i32 BE][blob][crc32(blob) i32
  BE]``. Inline DVs ("i") are the Z85 of the blob alone.

Everything is pure-Python/stdlib and driver-side: DVs are metadata-sized
(cardinality counts rows of ONE file), never a Spark job.
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------------
# Z85 (ZeroMQ RFC 32)
# --------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

DV_MAGIC = 1681511377  # Delta PROTOCOL.md deletion-vector blob magic
DV_FILE_VERSION = 1

_COOKIE_RUNS = 12346  # SERIAL_COOKIE (run containers possible)
_COOKIE_NO_RUNS = 12347  # SERIAL_COOKIE_NO_RUNCONTAINER
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 needs a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 needs a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 quintet overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit RoaringBitmap portable serialization
# --------------------------------------------------------------------------


def _serialize_roaring32(values: list[int], use_runs: bool = False) -> bytes:
    """``values`` sorted unique u32. Writer for fixtures + the export
    path; emits the offset header exactly when the spec requires it."""
    containers: list[tuple[int, list[int]]] = []
    cur_key: int | None = None
    cur: list[int] = []
    for v in values:
        k = v >> 16
        if k != cur_key:
            if cur_key is not None:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur_key is not None:
        containers.append((cur_key, cur))
    n = len(containers)

    bodies: list[bytes] = []
    is_run: list[bool] = []
    for _, vals in containers:
        runs: list[tuple[int, int]] = []
        if use_runs:
            start = prev = vals[0]
            for v in vals[1:]:
                if v == prev + 1:
                    prev = v
                    continue
                runs.append((start, prev - start))
                start = prev = v
            runs.append((start, prev - start))
        if use_runs and 2 + 4 * len(runs) < 2 * len(vals):
            bodies.append(
                struct.pack("<H", len(runs))
                + b"".join(struct.pack("<HH", s, ln) for s, ln in runs)
            )
            is_run.append(True)
        elif len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
            is_run.append(False)
        else:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
            is_run.append(False)

    out = bytearray()
    has_runs = any(is_run)
    if has_runs:
        out += struct.pack("<I", _COOKIE_RUNS | ((n - 1) << 16))
        bitset = bytearray((n + 7) // 8)
        for i, r in enumerate(is_run):
            if r:
                bitset[i // 8] |= 1 << (i % 8)
        out += bitset
    else:
        out += struct.pack("<II", _COOKIE_NO_RUNS, n)
    for (key, vals), body in zip(containers, bodies):
        out += struct.pack("<HH", key, len(vals) - 1)
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        pos = len(out) + 4 * n
        for body in bodies:
            out += struct.pack("<I", pos)
            pos += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def _deserialize_roaring32(buf: memoryview, pos: int) -> tuple[list[int], int]:
    """Sequential portable-format reader (offset header skipped, not
    trusted). Returns (sorted u32 values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_flags: list[bool]
    if (cookie & 0xFFFF) == _COOKIE_RUNS:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        bits = bytes(buf[pos : pos + nbytes])
        pos += nbytes
        run_flags = [bool(bits[i // 8] & (1 << (i % 8))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUNS:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"not a portable RoaringBitmap (cookie={cookie})")
    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n):
        k, c1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c1 + 1)
    if has_offsets:
        pos += 4 * n  # parse sequentially; offsets are redundant
    out: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        if run_flags[i]:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                s, ln = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(range(base + s, base + s + ln + 1))
        elif cards[i] > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    out.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            out.extend(base + v for v in vals)
    return out, pos


# --------------------------------------------------------------------------
# 64-bit RoaringBitmapArray blob (Delta's DV payload)
# --------------------------------------------------------------------------


def serialize_dv_blob(row_indexes: list[int], use_runs: bool = False) -> bytes:
    """Magic + portable RoaringBitmapArray over sorted unique i64 row
    indexes (the deleted positions of ONE data file)."""
    idx = sorted(set(row_indexes))
    if idx and (idx[0] < 0 or idx[-1] >> 63):
        raise ValueError("row indexes must be non-negative int64")
    groups: list[tuple[int, list[int]]] = []
    for v in idx:
        hi = v >> 32
        if not groups or groups[-1][0] != hi:
            groups.append((hi, []))
        groups[-1][1].append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", DV_MAGIC, len(groups)))
    for hi, vals in groups:
        out += struct.pack("<i", hi)
        out += _serialize_roaring32(vals, use_runs=use_runs)
    return bytes(out)


def deserialize_dv_blob(data: bytes) -> list[int]:
    buf = memoryview(data)
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != DV_MAGIC:
        raise ValueError(
            f"deletion-vector blob magic {magic} != {DV_MAGIC} — corrupt or "
            "not a Delta DV"
        )
    pos = 12
    out: list[int] = []
    last_hi = -1
    for _ in range(n):
        (hi,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        if hi <= last_hi:
            raise ValueError("DV bitmap keys not strictly increasing")
        last_hi = hi
        vals, pos = _deserialize_roaring32(buf, pos)
        out.extend((hi << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError(
            f"{len(buf) - pos} trailing bytes after DV bitmap — truncated "
            "descriptor sizeInBytes or corrupt blob"
        )
    return out


# --------------------------------------------------------------------------
# DV file framing ([version][dataSize BE][blob][crc32 BE] per entry)
# --------------------------------------------------------------------------


def dv_inline_encode(blob: bytes) -> str:
    """Z85 for an inline ('i') descriptor: the codec works in 4-byte
    units, so the blob is zero-padded — the descriptor's ``sizeInBytes``
    tells the reader where the real bytes end."""
    pad = (-len(blob)) % 4
    return z85_encode(blob + b"\x00" * pad)


def dv_inline_decode(text: str, size_in_bytes: int | None) -> list[int]:
    blob = z85_decode(text)
    if size_in_bytes is not None:
        if size_in_bytes > len(blob):
            raise ValueError(
                f"inline DV shorter ({len(blob)}) than descriptor "
                f"sizeInBytes ({size_in_bytes})"
            )
        blob = blob[: int(size_in_bytes)]
    return deserialize_dv_blob(blob)


def write_dv_file(path: str, blobs: list[bytes]) -> list[tuple[int, int]]:
    """Write a Delta DV .bin file holding ``blobs``; returns each blob's
    (offset, sizeInBytes) for its descriptor."""
    spans: list[tuple[int, int]] = []
    with open(path, "wb") as fh:
        fh.write(bytes([DV_FILE_VERSION]))
        pos = 1
        for blob in blobs:
            fh.write(struct.pack(">i", len(blob)))
            fh.write(blob)
            fh.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
            spans.append((pos, len(blob)))
            pos += 4 + len(blob) + 4
    return spans


def read_dv_from_file(path: str, offset: int, size_in_bytes: int) -> list[int]:
    with open(path, "rb") as fh:
        head = fh.read(1)
        if not head or head[0] != DV_FILE_VERSION:
            raise ValueError(
                f"unsupported DV file version {head!r} at {path}"
            )
        fh.seek(offset)
        (data_size,) = struct.unpack(">i", fh.read(4))
        if data_size != size_in_bytes:
            raise ValueError(
                f"DV dataSize {data_size} != descriptor sizeInBytes "
                f"{size_in_bytes} at {path}:{offset}"
            )
        blob = fh.read(data_size)
        if len(blob) != data_size:
            raise ValueError(f"truncated DV blob at {path}:{offset}")
        (crc,) = struct.unpack(">I", fh.read(4))
        if crc != (zlib.crc32(blob) & 0xFFFFFFFF):
            raise ValueError(f"DV checksum mismatch at {path}:{offset}")
    return deserialize_dv_blob(blob)
