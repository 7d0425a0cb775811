"""Stdlib PNG codec + perceptual-hash image near-dup (VERDICT r08 #4):
pixel-exact decode round-trip across filter types and color types, the
committed real fixture, hash separation (dups <= 3, non-dups >= 19 at
the fixture dials), banding completeness, and the registered query's
ground-truth duplicate map."""

from __future__ import annotations

import os

import numpy as np
import pytest

from delta_lake_optimizations_spark.operators.imagehash import (
    _fixture_pixels,
    ahash64,
    dhash64,
    image_hashes,
    image_phash_near_dup,
    phash_near_pairs,
    png_decode,
    png_encode,
    synthetic_image_assets,
)

_MEDIA = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(3)
    for nch in (1, 2, 3, 4):
        pix = rng.integers(0, 256, size=(5, 7, nch), dtype=np.uint8)
        data = png_encode(7, 5, nch, pix.tobytes())
        w, h, out_nch, out = png_decode(data)
        assert (w, h, out_nch) == (7, 5, nch)
        assert out == pix.tobytes()


def test_png_decode_all_filter_types():
    """Hand-build a PNG whose scanlines use every filter type (0..4) and
    check the unfilter math against a straightforward reference."""
    import struct
    import zlib

    w, nch = 4, 1
    lines = [
        bytes([10, 20, 30, 40]),
        bytes([5, 15, 25, 35]),
        bytes([200, 100, 50, 25]),
        bytes([1, 2, 3, 4]),
        bytes([250, 251, 252, 253]),
    ]
    filters = [0, 1, 2, 3, 4]

    # forward-filter each line per spec so decode must invert it
    def filt(ftype, line, prev):
        out = bytearray()
        for i in range(len(line)):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ftype == 0:
                out.append(line[i])
            elif ftype == 1:
                out.append((line[i] - a) & 0xFF)
            elif ftype == 2:
                out.append((line[i] - b) & 0xFF)
            elif ftype == 3:
                out.append((line[i] - ((a + b) >> 1)) & 0xFF)
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((line[i] - pr) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = bytes(w * nch)
    for ftype, line in zip(filters, lines):
        raw.append(ftype)
        raw += filt(ftype, line, prev)
        prev = line

    def chunk(typ, body):
        return (
            len(body).to_bytes(4, "big") + typ + body
            + zlib.crc32(typ + body).to_bytes(4, "big")
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, len(lines), 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got_w, got_h, got_nch, pix = png_decode(data)
    assert (got_w, got_h, got_nch) == (w, len(lines), 1)
    assert pix == b"".join(lines)


def test_png_decode_committed_fixture_and_refusals():
    with open(os.path.join(_MEDIA, "tiny.png"), "rb") as fh:
        data = fh.read()
    w, h, nch, pix = png_decode(data)
    assert (w, h) == (3, 2) and nch in (3, 4)
    assert len(pix) == w * h * nch
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    with open(os.path.join(_MEDIA, "tiny.jpg"), "rb") as fh:
        with pytest.raises(ValueError):
            png_decode(fh.read())


def test_hash_separation_on_fixture_corpus():
    n = 32
    imgs = {i: _fixture_pixels(100 + i) for i in range(4)}
    rng4 = np.random.default_rng(7)
    imgs[4] = np.clip(
        imgs[0].astype(np.float64) + 4 + rng4.normal(0, 8, (n, n)), 0, 255
    ).astype(np.uint8)
    imgs[5] = imgs[1].copy()
    imgs[5][10:12, 20:22] = 255
    imgs[6] = imgs[2].copy()
    for i in range(7, 10):
        imgs[i] = _fixture_pixels(500 + i)
    for fn in (ahash64, dhash64):
        hs = {i: fn(n, n, 1, im.tobytes()) for i, im in imgs.items()}
        for a, b in [(0, 4), (1, 5), (2, 6)]:
            assert _ham(hs[a], hs[b]) <= 3, (fn.__name__, a, b)
        import itertools

        for a, b in itertools.combinations(range(10), 2):
            if (a, b) not in [(0, 4), (1, 5), (2, 6)]:
                assert _ham(hs[a], hs[b]) >= 8, (fn.__name__, a, b)


def test_image_hashes_operator_and_mixed_corpus(spark):
    """The mapInPandas operator: PNG rows get real pixel hashes matching
    the driver-side functions; non-PNG payloads yield decoder='none'."""
    assets = synthetic_image_assets(spark)
    extra = spark.createDataFrame(
        [(99, bytearray(b"not an image"))], assets.schema
    )
    got = {
        r["doc_id"]: r
        for r in image_hashes(assets.unionByName(extra)).collect()
    }
    assert got[99]["decoder"] == "none" and got[99]["ahash"] is None
    n = 32
    base = _fixture_pixels(100)
    assert got[0]["decoder"] == "png-zlib"
    assert got[0]["width"] == n and got[0]["height"] == n
    assert got[0]["ahash"] == ahash64(n, n, 1, base.tobytes())
    assert got[0]["dhash"] == dhash64(n, n, 1, base.tobytes())


def test_phash_near_pairs_matches_exhaustive(spark):
    """Banded candidate join finds exactly the pairs an exhaustive scan
    finds at Hamming <= 6 (pigeonhole holds: all fixture dups <= 3)."""
    hashes = image_hashes(synthetic_image_assets(spark))
    rows = {r["doc_id"]: r["ahash"] for r in hashes.collect()}
    import itertools

    want = sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if _ham(rows[a], rows[b]) <= 6
    )
    got = sorted(
        (r["img_a"], r["img_b"])
        for r in phash_near_pairs(hashes, max_hamming=6).collect()
    )
    assert got == want == [(0, 4), (1, 5), (2, 6)]


def test_registered_query_ground_truth(spark):
    got = [
        (r["img_a"], r["img_b"])
        for r in image_phash_near_dup(spark, "/unused").collect()
    ]
    assert got == [(0, 4), (1, 5), (2, 6)]


def test_multimodal_decode_cascade_uses_png_pixels(spark):
    """decode_assets now reports decoder='png-zlib' (real pixel decode)
    for PNG payloads when PIL is absent, not the header-probe tier."""
    from delta_lake_optimizations_spark.operators.multimodal import (
        _PILImage,
        decode_assets,
    )

    assets = (
        synthetic_image_assets(spark)
        .withColumn("mime", F_lit("image/png"))
        .withColumn("n_bytes", F_length("payload"))
    )
    got = decode_assets(assets.select("doc_id", "mime", "n_bytes", "payload")).collect()
    expect = "pil" if _PILImage is not None else "png-zlib"
    assert all(r["decoder"] == expect for r in got)
    assert all(r["width"] == 32 and r["height"] == 32 for r in got)


from pyspark.sql.functions import length as F_length  # noqa: E402
from pyspark.sql.functions import lit as F_lit  # noqa: E402


def test_resize_assets_real_png_path(spark):
    """resize_assets does a REAL pixel resize for PNGs: output is a
    decodable PNG at the scaled dimensions whose pixels equal the
    driver-side box-average of the source."""
    import numpy as np

    from delta_lake_optimizations_spark.operators.imagehash import (
        _box_resize,
    )
    from delta_lake_optimizations_spark.operators.multimodal import (
        resize_assets,
    )

    assets = (
        synthetic_image_assets(spark)
        .withColumn("mime", F_lit("image/png"))
        .limit(2)
    )
    got = {r["doc_id"]: r for r in resize_assets(assets, max_side=8).collect()}
    for doc_id, r in got.items():
        assert (r["width"], r["height"]) == (8, 8)
        w, h, nch, pix = png_decode(bytes(r["payload"]))
        assert (w, h, nch) == (8, 8, 1)
        src = _fixture_pixels(100 + doc_id).astype(np.float64)
        want = np.clip(np.rint(_box_resize(src, 8, 8)), 0, 255).astype(np.uint8)
        assert pix == want.tobytes()
    # non-PNG payloads keep the deterministic fallback (no crash)
    junk = spark.createDataFrame(
        [(7, bytearray(b"opaque bytes here"), "application/octet-stream")],
        "doc_id long, payload binary, mime string",
    )
    out = resize_assets(junk, max_side=8).collect()
    assert len(out) == 1 and out[0]["width"] >= 1


# ---------------------------------------------------------------------------
# BMP / GIF stdlib codecs (round 9): round trips, width-budget edge,
# interlace, committed-fixture decode, cross-format hash identity.
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_gray_and_rgb():
    import numpy as np

    from delta_lake_optimizations_spark.operators.imagehash import (
        bmp_decode,
        bmp_encode,
    )

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(13, 7), dtype=np.uint8)
    w, h, nch, pix = bmp_decode(bmp_encode(7, 13, 1, g.tobytes()))
    a = np.frombuffer(pix, np.uint8).reshape(h, w, nch)
    assert (w, h, nch) == (7, 13, 3)
    assert (a == g[:, :, None]).all()  # gray replicated to RGB

    rgb = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    w, h, nch, pix = bmp_decode(bmp_encode(9, 5, 3, rgb.tobytes()))
    assert np.frombuffer(pix, np.uint8).reshape(5, 9, 3).tolist() == rgb.tolist()


def test_gif_roundtrip_and_palette_bound():
    import numpy as np

    import pytest

    from delta_lake_optimizations_spark.operators.imagehash import (
        gif_decode,
        gif_encode,
    )

    rng = np.random.default_rng(4)
    # 300+ pixels with a small palette: forces multiple CLEAR segments
    # (the width-budget edge the encoder must never cross)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, size=(20, 17))
    rgb = pal[idx].astype(np.uint8)
    w, h, nch, pix = gif_decode(gif_encode(17, 20, 3, rgb.tobytes()))
    assert (w, h, nch) == (17, 20, 3)
    assert np.frombuffer(pix, np.uint8).reshape(20, 17, 3).tolist() == rgb.tolist()

    # exactly 256 distinct colors is fine; 257 refuses
    g256 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    gif_decode(gif_encode(16, 16, 1, g256.tobytes()))
    many = np.zeros((17, 16, 3), dtype=np.uint8)
    many[:, :, 0] = np.arange(17 * 16).reshape(17, 16) % 256
    many[:, :, 1] = np.arange(17 * 16).reshape(17, 16) // 256
    with pytest.raises(ValueError, match="256"):
        gif_encode(16, 17, 3, many.tobytes())


def test_gif_deinterlace_order():
    from delta_lake_optimizations_spark.operators.imagehash import (
        _gif_deinterlace,
    )

    rows = [bytes([i]) for i in range(10)]
    # decoded (pass) order for h=10: 0,8 | 4 | 2,6 | 1,3,5,7,9
    out = _gif_deinterlace(rows, 10)
    # verify via the inverse: position p of original row r
    order = (
        list(range(0, 10, 8))
        + list(range(4, 10, 8))
        + list(range(2, 10, 4))
        + list(range(1, 10, 2))
    )
    expect = [b""] * 10
    for src, dst in zip(rows, order):
        expect[dst] = src
    assert out == expect


def test_committed_fixture_pixel_decode():
    from delta_lake_optimizations_spark.operators.imagehash import pixel_decode

    import os

    media = os.path.join(os.path.dirname(__file__), "fixtures", "media")
    w, h, nch, _pix, codec = pixel_decode(
        open(os.path.join(media, "tiny.bmp"), "rb").read()
    )
    assert (w, h, codec) == (6, 3, "bmp-stdlib")
    w, h, nch, _pix, codec = pixel_decode(
        open(os.path.join(media, "tiny.gif"), "rb").read()
    )
    assert (w, h, codec) == (5, 4, "gif-lzw")


def test_cross_format_hash_identity():
    """The same pixels through PNG, BMP and GIF containers must produce
    IDENTICAL perceptual hashes — the property the cross-format near-dup
    query's ground truth rests on."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        _fixture_pixels,
        ahash64,
        bmp_encode,
        dhash64,
        gif_encode,
        pixel_decode,
        png_encode,
    )

    g = _fixture_pixels(seed=100).tobytes()
    n = 32
    hashes = set()
    for enc in (png_encode, bmp_encode, gif_encode):
        w, h, nch, pix, _codec = pixel_decode(enc(n, n, 1, g))
        hashes.add((ahash64(w, h, nch, pix), dhash64(w, h, nch, pix)))
    assert len(hashes) == 1, hashes


# ---------------------------------------------------------------------------
# Malformed-input totality (review findings): truncated/hostile payloads
# must yield decoder='none' rows, never kill the task.
# ---------------------------------------------------------------------------

_HOSTILE = [
    b"GIF89a" + b"\x05\x00\x04\x00\x00\x00\x00" + b"\x2c\x00\x00",  # trunc desc
    b"\xff\xd8\xff\xc0\x00\x03\x08",  # truncated SOF
    b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x07\x00\x09\x01\x01\x11\x00"
    b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00\xab\xcd",  # SOS without DHT
    b"GIF89a\xff\xff\xff\xff\x00\x00\x00",  # 65535x65535 claimed canvas
    b"BM" + b"\x00" * 60,  # zero-dim BMP
    b"\x89PNG\r\n\x1a\nrubbish",  # PNG sig, garbage body
]


def test_hostile_payloads_raise_decode_errors_not_crash():
    from delta_lake_optimizations_spark.operators.imagehash import (
        DECODE_ERRORS,
        pixel_decode,
    )

    import pytest

    for payload in _HOSTILE:
        with pytest.raises(DECODE_ERRORS):
            pixel_decode(payload)


def test_image_hashes_total_on_hostile_corpus(spark):
    import pyspark.sql.types as T

    from delta_lake_optimizations_spark.operators.imagehash import (
        _fixture_pixels,
        image_hashes,
        png_encode,
    )

    rows = [(i, bytearray(p)) for i, p in enumerate(_HOSTILE)]
    rows.append((99, bytearray(png_encode(32, 32, 1, _fixture_pixels(1).tobytes()))))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    out = {r["doc_id"]: r for r in image_hashes(spark.createDataFrame(rows, schema)).collect()}
    assert len(out) == len(_HOSTILE) + 1
    for i in range(len(_HOSTILE)):
        assert out[i]["decoder"] == "none" and out[i]["ahash"] is None
    assert out[99]["decoder"] == "png-zlib" and out[99]["ahash"] is not None


def test_video_frame_hashes_total_on_hostile_corpus(spark):
    import pyspark.sql.types as T

    from delta_lake_optimizations_spark.operators.videodedup import (
        video_frame_hashes,
    )

    rows = [(i, bytearray(p)) for i, p in enumerate(_HOSTILE)]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    out = video_frame_hashes(spark.createDataFrame(rows, schema)).collect()
    assert len(out) == len(_HOSTILE)
    assert all(r["decoder"] == "none" and r["ahash"] is None for r in out)


def test_gif_local_color_table_does_not_recolor_prior_frames():
    """Frame 2 carries a LOCAL color table and covers a sub-rectangle;
    the untouched region must keep frame 1's global-table colors."""
    import struct as _struct

    import numpy as np

    from delta_lake_optimizations_spark.operators.imagehash import (
        gif_decode_frames,
        gif_encode_frames,
    )

    # frame 1: 4x2 full canvas, two global colors (indexes 0,1)
    f1 = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.uint8)
    base = gif_encode_frames(4, 2, 1, [f1.tobytes()])
    assert base.endswith(b"\x3b")
    body = bytearray(base[:-1])  # strip trailer
    # frame 2: 1x1 sub-rectangle at (0,0) with a LOCAL 2-entry table
    # whose index 0 is RED — encoded as literal LZW (mcs=2)
    lct = bytes((255, 0, 0, 0, 255, 0)) + b"\x00" * (3 * 2)  # pad to 4
    mcs = 2
    # codes: CLEAR(4), literal 0, EOI(5) at width 3, LSB-first
    bits = (4) | (0 << 3) | (5 << 6)
    lzw = _struct.pack("<H", bits)[:2]
    body += b"\x2c" + _struct.pack("<HHHHB", 0, 0, 1, 1, 0x80 | 1)
    body += lct + bytes((mcs,)) + bytes((len(lzw),)) + lzw + b"\x00"
    body += b"\x3b"
    w, h, frames = gif_decode_frames(bytes(body))
    assert len(frames) == 2
    a2 = np.frombuffer(frames[1], np.uint8).reshape(2, 4, 3)
    assert a2[0, 0].tolist() == [255, 0, 0]  # painted via the LOCAL table
    # region untouched by frame 2 keeps frame 1's GLOBAL colors
    a1 = np.frombuffer(frames[0], np.uint8).reshape(2, 4, 3)
    assert a2[1, 3].tolist() == a1[1, 3].tolist()
    assert a2[0, 1].tolist() == a1[0, 1].tolist()


def test_gif_disposal_restore_to_background():
    """A frame whose GCE declares disposal method 2 is erased to the
    background color before the next frame composes — a later partial
    frame must not inherit its pixels."""
    import struct as _struct

    import numpy as np

    from delta_lake_optimizations_spark.operators.imagehash import (
        gif_decode_frames,
        gif_encode_frames,
    )

    # base single-frame GIF: 4x2, colors idx0 (=background) and idx1
    f1 = np.array([[0, 1, 1, 0], [1, 1, 1, 1]], np.uint8) * 9
    base = gif_encode_frames(4, 2, 1, [f1.tobytes()])
    body = bytearray(base[:-1])
    # inject a GCE with disposal=2 BEFORE the (only) image descriptor
    img_at = body.find(b"\x2c")
    gce = b"\x21\xf9\x04" + bytes(((2 << 2),)) + b"\x00\x00\x00\x00"
    body[img_at:img_at] = gce
    # second frame: 1x1 rect at (3,1) painting index 1
    mcs = 2
    bits = (4) | (1 << 3) | (5 << 6)  # CLEAR, literal 1, EOI at width 3
    lzw = _struct.pack("<H", bits)[:2]
    body += b"\x2c" + _struct.pack("<HHHHB", 3, 1, 1, 1, 0)
    body += bytes((mcs,)) + bytes((len(lzw),)) + lzw + b"\x00" + b"\x3b"
    w, h, frames = gif_decode_frames(bytes(body))
    assert len(frames) == 2
    a1 = np.frombuffer(frames[0], np.uint8).reshape(2, 4, 3)
    a2 = np.frombuffer(frames[1], np.uint8).reshape(2, 4, 3)
    # frame 1 rendered normally
    assert (a1[0, 1] != a1[0, 0]).any()
    # frame 2: everything except its own 1x1 rect restored to background
    bg = a1[0, 0].tolist()  # index 0 IS the background color here
    assert a2[0, 1].tolist() == bg and a2[1, 0].tolist() == bg
    assert a2[1, 3].tolist() == a1[0, 1].tolist()  # its own painted pixel


def test_banded_candidates_recall_at_filter_radius(spark):
    """ADVICE r9: a pair at Hamming 4-6 whose flipped bits land one per
    16-bit band shared NO band under the fixed 4x16 scheme and was
    silently dropped despite passing the max_hamming=6 filter. The band
    count now adapts (bands_for_hamming) so pigeonhole covers the query
    radius."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        bands_for_hamming,
    )

    assert bands_for_hamming(3) == 4
    assert bands_for_hamming(6) == 8
    assert bands_for_hamming(7) == 8
    # adversarial signature pair: Hamming 4, one flipped bit in each
    # 16-bit band (bits 0, 16, 32, 48)
    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
    hashes = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, ahash long"
    )
    got = phash_near_pairs(hashes, max_hamming=6).collect()
    assert len(got) == 1 and got[0]["hamming"] == 4
    # and a Hamming-8 pair stays excluded by the exact filter
    c = b | (1 << 8) | (1 << 24) | (1 << 40) | (1 << 56)
    hashes2 = spark.createDataFrame(
        [(1, a), (2, c)], "doc_id long, ahash long"
    )
    assert phash_near_pairs(hashes2, max_hamming=6).count() == 0
