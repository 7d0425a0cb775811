"""Header-probe tests against hand-built, spec-correct binary assets:
PNG IHDR, JPEG SOF walk, GIF/BMP fixed fields, WAV RIFF chunks,
garbage tolerance, and the distributed mapInPandas path."""

from __future__ import annotations

import struct

from delta_lake_optimizations_spark.operators.mediaprobe import (
    probe_assets,
    probe_media,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _bmp(w: int, h: int) -> bytes:
    header = b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
    return header + b"\x00" * 10


def _wav(channels: int, rate: int, n_samples: int, bits: int = 16) -> bytes:
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _expect(got: dict, **want) -> None:
    for k, v in want.items():
        assert got[k] == v, f"{k}: {got[k]!r} != {v!r} ({got})"


def test_probe_png_jpeg_gif_bmp():
    _expect(probe_media(_png(640, 480)), detected="image/png", width=640, height=480)
    _expect(probe_media(_jpeg(1024, 768)), detected="image/jpeg", width=1024, height=768)
    _expect(probe_media(_gif(32, 16)), detected="image/gif", width=32, height=16)
    _expect(probe_media(_bmp(200, 100)), detected="image/bmp", width=200, height=100)
    # BMP bottom-up negative height normalizes
    assert probe_media(_bmp(200, -100))["height"] == 100


def test_probe_wav_audio_facts():
    got = probe_media(_wav(channels=2, rate=16000, n_samples=16000))
    assert got["detected"] == "audio/wav"
    assert got["channels"] == 2
    assert got["sample_rate"] == 16000
    assert got["duration_ms"] == 1000


def test_probe_garbage_never_throws():
    for junk in (None, b"", b"\x00" * 3, b"\xff\xd8\xff", _png(1, 1)[:12], b"RIFFxxxx"):
        got = probe_media(junk)
        assert got["detected"] in ("unknown", "image/jpeg")  # truncated stays partial
        # and never raises


def test_probe_assets_distributed(spark):
    rows = [
        (1, _png(640, 480)),
        (2, _jpeg(300, 200)),
        (3, _wav(1, 8000, 4000)),
        (4, b"not media at all"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(3)
    got = {r["doc_id"]: r.asDict() for r in probe_assets(df).collect()}
    assert got[1]["detected"] == "image/png" and got[1]["width"] == 640
    assert got[2]["detected"] == "image/jpeg" and got[2]["height"] == 200
    assert got[3]["detected"] == "audio/wav" and got[3]["duration_ms"] == 500
    assert got[4]["detected"] == "unknown" and got[4]["n_bytes"] == 16
    assert got[5]["detected"] == "unknown" and got[5]["n_bytes"] == 0
