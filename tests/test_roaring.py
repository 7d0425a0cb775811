"""Delta DV bitstream codec (table/roaring.py): Z85 (ZeroMQ RFC 32),
32-bit RoaringBitmap portable serialization (RoaringFormatSpec), the
64-bit RoaringBitmapArray blob, and the DV file framing — roundtrips,
spec vectors, and corruption refusals."""

from __future__ import annotations

import os
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from delta_lake_optimizations_spark.table.roaring import (
    deserialize_dv_blob,
    dv_inline_decode,
    dv_inline_encode,
    read_dv_from_file,
    serialize_dv_blob,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_rfc_vector():
    # the RFC 32 reference vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F,
                             0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=64).map(lambda b: b[: len(b) - len(b) % 4]))
def test_z85_roundtrip(b):
    assert z85_decode(z85_encode(b)) == b


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError):
        z85_encode(b"abc")  # not a multiple of 4
    with pytest.raises(ValueError):
        z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        z85_decode('abcd"')  # " is not in the alphabet


_CASES = [
    [],
    [0],
    [5, 7, 9],
    list(range(10000)),  # forces a bitmap container
    [2**33 + 5, 2**33 + 6, 12, 2**40],  # multiple 32-bit sub-bitmaps
    list(range(100, 200)) + list(range(70000, 70100)),  # two containers
]


@pytest.mark.parametrize("case", _CASES)
@pytest.mark.parametrize("use_runs", [False, True])
def test_dv_blob_roundtrip(case, use_runs):
    blob = serialize_dv_blob(case, use_runs=use_runs)
    assert deserialize_dv_blob(blob) == sorted(set(case))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 2**40), max_size=200),
    st.booleans(),
)
def test_dv_blob_roundtrip_hypothesis(values, use_runs):
    blob = serialize_dv_blob(values, use_runs=use_runs)
    assert deserialize_dv_blob(blob) == sorted(set(values))


def test_dv_blob_rejects_bad_magic_and_trailing_bytes():
    blob = serialize_dv_blob([1, 2, 3])
    bad = struct.pack("<i", 99) + blob[4:]
    with pytest.raises(ValueError, match="magic"):
        deserialize_dv_blob(bad)
    with pytest.raises(ValueError, match="trailing"):
        deserialize_dv_blob(blob + b"\x00")


def test_dv_file_framing_and_checksum(tmp_path):
    p = str(tmp_path / "dv.bin")
    blobs = [
        serialize_dv_blob([1, 2, 3]),
        serialize_dv_blob(list(range(5000)), use_runs=True),
    ]
    spans = write_dv_file(p, blobs)
    assert read_dv_from_file(p, *spans[0]) == [1, 2, 3]
    assert read_dv_from_file(p, *spans[1]) == list(range(5000))
    # corrupting one byte of a blob trips the CRC-32 (or magic) check
    data = bytearray(open(p, "rb").read())
    data[spans[0][0] + 5] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        read_dv_from_file(p, *spans[0])


def test_dv_file_rejects_size_mismatch_and_bad_version(tmp_path):
    p = str(tmp_path / "dv2.bin")
    (span,) = write_dv_file(p, [serialize_dv_blob([7])])
    with pytest.raises(ValueError, match="sizeInBytes"):
        read_dv_from_file(p, span[0], span[1] + 1)
    data = bytearray(open(p, "rb").read())
    data[0] = 9
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="version"):
        read_dv_from_file(p, *span)


def test_inline_encode_pads_and_decode_truncates():
    blob = serialize_dv_blob([1, 3, 4])
    enc = dv_inline_encode(blob)
    assert len(enc) % 5 == 0
    assert dv_inline_decode(enc, len(blob)) == [1, 3, 4]
    with pytest.raises(ValueError, match="shorter"):
        dv_inline_decode(enc, len(blob) + 100)


def test_run_container_reader():
    """The reader must handle the 12346 run-container cookie (real Delta
    writers emit runs for contiguous deletes): a dense range serializes
    to runs and reads back exactly."""
    vals = list(range(3000, 9000))
    blob = serialize_dv_blob(vals, use_runs=True)
    no_runs = serialize_dv_blob(vals, use_runs=False)
    assert len(blob) < len(no_runs)  # runs actually engaged
    assert deserialize_dv_blob(blob) == vals
