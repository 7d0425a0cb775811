"""Baseline JPEG codec: lossy round-trip error bounds, DC/AC coverage,
restart markers, refusal classes, committed-fixture decode, and the
cross-lossy hash proximity the near-dup query rests on."""

from __future__ import annotations

import numpy as np
import pytest

from delta_lake_optimizations_spark.operators.jpegcodec import (
    jpeg_decode,
    jpeg_encode,
)


def _maxerr(a: bytes, b: np.ndarray) -> int:
    return int(np.abs(np.frombuffer(a, np.uint8).astype(int).reshape(b.shape) - b).max())


def test_flat_block_is_exact():
    flat = np.full((24, 17), 130, np.uint8)
    w, h, nch, pix = jpeg_decode(jpeg_encode(17, 24, 1, flat.tobytes(), 90))
    assert (w, h, nch) == (17, 24, 1)
    assert _maxerr(pix, flat) == 0


def test_gray_gradient_roundtrip_error_bound():
    yy, xx = np.mgrid[0:40, 0:33]
    g = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    w, h, nch, pix = jpeg_decode(jpeg_encode(33, 40, 1, g.tobytes(), 95))
    assert (w, h, nch) == (33, 40, 1)
    assert _maxerr(pix, g) <= 8  # wrap-around edges are the worst case


def test_rgb_roundtrip_error_bound():
    yy, xx = np.mgrid[0:40, 0:33]
    rgb = np.stack(
        [(xx * 3) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
    ).astype(np.uint8)
    w, h, nch, pix = jpeg_decode(jpeg_encode(33, 40, 3, rgb.tobytes(), 95))
    assert (w, h, nch) == (33, 40, 3)
    assert _maxerr(pix, rgb) <= 8


def test_noise_exercises_every_ac_path():
    # dense noise floods the AC coefficients (runs, ZRL, EOB all hit);
    # bound is loose — quantization bites hard on noise — but decode
    # must stay well-behaved and roughly faithful
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    w, h, nch, pix = jpeg_decode(jpeg_encode(32, 32, 1, g.tobytes(), 98))
    a = np.frombuffer(pix, np.uint8).astype(float).reshape(32, 32)
    assert np.abs(a - g).mean() < 12.0


def test_refusal_classes():
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nrest")
    # lossless-sequential (SOF3) refuses rather than misdecoding
    lossless = bytearray(jpeg_encode(8, 8, 1, bytes(64), 90))
    i = lossless.find(b"\xff\xc0")
    lossless[i + 1] = 0xC3
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(bytes(lossless))


def test_committed_fixture_decodes_with_pinned_dims():
    import os

    media = os.path.join(os.path.dirname(__file__), "fixtures", "media")
    data = open(os.path.join(media, "tiny.jpg"), "rb").read()
    w, h, nch, pix = jpeg_decode(data)
    assert (w, h, nch) == (9, 7, 1)
    # content is the deterministic (x*29 + y*17) % 256 ramp, quality 92
    yy, xx = np.mgrid[0:7, 0:9]
    g = ((xx * 29 + yy * 17) % 256).astype(np.uint8)
    assert _maxerr(pix, g) <= 10


def test_pixel_decode_cascade_reports_jpeg_tier():
    from delta_lake_optimizations_spark.operators.imagehash import pixel_decode

    g = np.full((16, 16), 77, np.uint8)
    w, h, nch, _pix, codec = pixel_decode(jpeg_encode(16, 16, 1, g.tobytes(), 90))
    assert (w, h, codec) == (16, 16, "jpeg-stdlib")


def test_lossy_hash_proximity():
    """aHash of the JPEG re-encode must sit within the near-dup gate of
    the lossless original — the property image_cross_format_near_dup's
    ground truth rests on."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        _fixture_pixels,
        ahash64,
        pixel_decode,
        png_encode,
    )

    for seed in (100, 101, 102):
        g = _fixture_pixels(seed=seed).tobytes()
        h_png = ahash64(*pixel_decode(png_encode(32, 32, 1, g))[:4])
        h_jpg = ahash64(*pixel_decode(jpeg_encode(32, 32, 1, g, 90))[:4])
        assert bin((h_png ^ h_jpg) & ((1 << 64) - 1)).count("1") <= 6


def test_restart_markers_roundtrip():
    """DRI + RSTn path: bit flush, marker resync, DC predictor reset."""
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((xx * 7 + yy * 11) % 256).astype(np.uint8)
    b = jpeg_encode(40, 24, 1, g.tobytes(), 95, restart_interval=2)
    assert b"\xff\xdd" in b and b"\xff\xd0" in b  # DRI present, RST0 hit
    w, h, nch, pix = jpeg_decode(b)
    assert (w, h, nch) == (40, 24, 1)
    assert _maxerr(pix, g) <= 8


def test_420_chroma_subsampling_roundtrip():
    """4:2:0 exercises the decoder's multi-block-per-MCU sampling +
    chroma-upsample path (the layout most web JPEGs use); error bound
    reflects expected chroma loss on a color gradient."""
    yy, xx = np.mgrid[0:40, 0:33]
    rgb = np.stack(
        [(xx * 3) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
    ).astype(np.uint8)
    b = jpeg_encode(33, 40, 3, rgb.tobytes(), 95, subsampling="420")
    w, h, nch, pix = jpeg_decode(b)
    assert (w, h, nch) == (33, 40, 3)
    a = np.frombuffer(pix, np.uint8).astype(float).reshape(40, 33, 3)
    assert np.abs(a - rgb).mean() < 2.0 and np.abs(a - rgb).max() <= 12
    # the stream really is subsampled: Y component advertises 2x2
    sof = b.find(b"\xff\xc0")
    assert b[sof + 11] == 0x22 and b[sof + 14] == 0x11


def test_420_with_restarts_and_odd_dims():
    yy, xx = np.mgrid[0:37, 0:29]
    g = np.stack([((xx * 7) % 200) + 20] * 3, -1).astype(np.uint8)
    b = jpeg_encode(
        29, 37, 3, g.tobytes(), 92, restart_interval=2, subsampling="420"
    )
    w, h, nch, pix = jpeg_decode(b)
    assert (w, h, nch) == (29, 37, 3)
    a = np.frombuffer(pix, np.uint8).astype(float).reshape(37, 29, 3)
    assert np.abs(a - g).mean() < 1.5


def test_fill_bytes_and_standalone_markers_in_header():
    """ADVICE r9: T.81-legal fill bytes (repeated 0xFF before a marker)
    and standalone TEM markers in the header walk must not derail the
    segment parser — real-world baseline JPEGs use both."""
    base = jpeg_encode(17, 9, 1, bytes(range(0, 153)), 90)
    ref = jpeg_decode(base)
    # inject two fill bytes + a TEM marker right after SOI
    patched = base[:2] + b"\xff\xff\xff\x01" + base[2:]
    assert jpeg_decode(patched) == ref
    # fill bytes immediately before an existing segment marker deeper in
    i = base.find(b"\xff\xc4")
    patched2 = base[:i] + b"\xff" + base[i:]
    assert jpeg_decode(patched2) == ref


# ---------------------------------------------------------------------------
# Progressive (SOF2) — VERDICT r09 #2
# ---------------------------------------------------------------------------


def test_progressive_gray_matches_baseline_decode():
    """Same pixels, same quantization: the progressive scan script must
    reconstruct the SAME coefficients the baseline stream carries, so
    the decodes agree to within IDCT float rounding (<=1 level)."""
    yy, xx = np.mgrid[0:40, 0:33]
    g = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(33, 40, 1, g.tobytes(), 95))
    prog_bytes = jpeg_encode(33, 40, 1, g.tobytes(), 95, progressive=True)
    prog = jpeg_decode(prog_bytes)
    # sanity: the progressive stream really is progressive (SOF2 marker)
    # while the baseline one is baseline (SOF0) — container bytes differ.
    assert prog_bytes.find(b"\xff\xc2") >= 0
    assert prog_bytes.find(b"\xff\xc0") < 0
    base_bytes = jpeg_encode(33, 40, 1, g.tobytes(), 95)
    assert base_bytes.find(b"\xff\xc0") >= 0
    assert base_bytes.find(b"\xff\xc2") < 0
    assert (prog[0], prog[1], prog[2]) == (33, 40, 1)
    a = np.frombuffer(base[3], np.uint8).astype(int)
    b = np.frombuffer(prog[3], np.uint8).astype(int)
    assert int(np.abs(a - b).max()) <= 1


def test_progressive_rgb_420_matches_baseline_decode():
    yy, xx = np.mgrid[0:37, 0:50]
    rgb = np.stack(
        [(xx * 3) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
    ).astype(np.uint8)
    for sub in ("444", "420"):
        base = jpeg_decode(
            jpeg_encode(50, 37, 3, rgb.tobytes(), 92, subsampling=sub)
        )
        prog = jpeg_decode(
            jpeg_encode(
                50, 37, 3, rgb.tobytes(), 92, subsampling=sub,
                progressive=True,
            )
        )
        assert (prog[0], prog[1], prog[2]) == (50, 37, 3)
        a = np.frombuffer(base[3], np.uint8).astype(int)
        b = np.frombuffer(prog[3], np.uint8).astype(int)
        assert int(np.abs(a - b).max()) <= 1


def test_progressive_noise_hits_refinement_and_zrl_paths():
    """Dense noise floods every band and bit level: EOB runs, ZRL inside
    refinement scans, correction bits over history coefficients."""
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, size=(48, 41), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(41, 48, 1, g.tobytes(), 98))
    prog = jpeg_decode(
        jpeg_encode(41, 48, 1, g.tobytes(), 98, progressive=True)
    )
    a = np.frombuffer(base[3], np.uint8).astype(int)
    b = np.frombuffer(prog[3], np.uint8).astype(int)
    assert int(np.abs(a - b).max()) <= 1


def test_progressive_flat_image_accumulates_eob_runs():
    """A large flat image makes every AC band all-zero: the encoder
    accumulates multi-block EOB runs (EOBn symbols, run > 1) and the
    decoder's eobrun skip path must walk them exactly."""
    flat = np.full((128, 200), 77, np.uint8)
    w, h, nch, pix = jpeg_decode(
        jpeg_encode(200, 128, 1, flat.tobytes(), 90, progressive=True)
    )
    assert (w, h, nch) == (200, 128, 1)
    assert _maxerr(pix, flat) == 0


def test_progressive_truncation_totality():
    """Every truncation point of a progressive stream must raise inside
    DECODE_ERRORS (the mapInPandas totality contract) — never hang,
    never return garbage dimensions silently."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        DECODE_ERRORS,
    )

    yy, xx = np.mgrid[0:24, 0:24]
    g = ((xx * 7 + yy) % 256).astype(np.uint8)
    full = jpeg_encode(24, 24, 1, g.tobytes(), 90, progressive=True)
    ref = jpeg_decode(full)
    for cut in range(2, len(full) - 1, max(1, len(full) // 37)):
        try:
            got = jpeg_decode(full[:cut])
        except DECODE_ERRORS:
            continue
        # a prefix that still contains complete scans may legally decode
        assert (got[0], got[1], got[2]) == (ref[0], ref[1], ref[2])


def test_pixel_decode_cascade_reports_progressive_jpeg():
    from delta_lake_optimizations_spark.operators.imagehash import (
        pixel_decode,
    )

    g = np.full((16, 16), 200, np.uint8)
    w, h, nch, pix, codec = pixel_decode(
        jpeg_encode(16, 16, 1, g.tobytes(), 90, progressive=True)
    )
    assert (w, h, nch, codec) == (16, 16, 1, "jpeg-stdlib")
    assert _maxerr(pix, g) == 0
