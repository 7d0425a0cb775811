"""Video (animated-GIF) near-dup: multi-frame codec round trip, frame
hashing totality, trimmed/brightness/verbatim duplicate detection with
margins, incidental-frame rejection, and oracle parity."""

from __future__ import annotations

import numpy as np
import pyspark.sql.types as T

from delta_lake_optimizations_spark.operators.imagehash import (
    gif_decode_frames,
    gif_encode_frames,
)
from delta_lake_optimizations_spark.operators.videodedup import (
    synthetic_video_assets,
    video_frame_hashes,
    video_near_pairs,
)
from delta_lake_optimizations_spark.registry import registry

from .conftest import SF_DIR, compare_spark_duckdb

_DEFS = registry()


def test_animated_gif_roundtrip_every_frame():
    rng = np.random.default_rng(5)
    frames = [
        (rng.integers(0, 6, size=(12, 9), dtype=np.uint8) * 40) for _ in range(5)
    ]
    b = gif_encode_frames(9, 12, 1, [f.tobytes() for f in frames])
    w, h, out = gif_decode_frames(b)
    assert (w, h, len(out)) == (9, 12, 5)
    for f, o in zip(frames, out):
        a = np.frombuffer(o, np.uint8).reshape(12, 9, 3)
        assert (a[:, :, 0] == f).all()
    # max_frames caps decode work
    assert len(gif_decode_frames(b, max_frames=2)[2]) == 2


def test_frame_hashes_total_on_mixed_corpus(spark):
    assets = synthetic_video_assets(spark).limit(2).union(
        spark.createDataFrame(
            [(99, bytearray(b"not a video"))],
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("payload", T.BinaryType()),
                ]
            ),
        )
    )
    rows = video_frame_hashes(assets).collect()
    bad = [r for r in rows if r["doc_id"] == 99]
    assert len(bad) == 1 and bad[0]["decoder"] == "none" and bad[0]["ahash"] is None
    good = [r for r in rows if r["doc_id"] != 99]
    assert len(good) == 2 * 12 and all(r["decoder"] == "gif-lzw" for r in good)


def test_ground_truth_pairs_and_margins(spark):
    hashes = video_frame_hashes(synthetic_video_assets(spark))
    pairs = {
        (r["video_a"], r["video_b"]): r
        for r in video_near_pairs(hashes, max_hamming=6, min_match_frac=0.5).collect()
    }
    assert set(pairs) == {(0, 4), (1, 5), (2, 6)}
    # verbatim re-encode: every frame matches exactly
    assert pairs[(2, 6)]["match_frac"] == 1.0 and pairs[(2, 6)]["n_matched"] == 12
    # trimmed copy: all 8 surviving frames match (frac on the SHORTER clip)
    assert pairs[(1, 5)]["n_matched"] == 8 and pairs[(1, 5)]["match_frac"] == 1.0
    # brightness-shifted re-encode: at least half the frames still match
    assert pairs[(0, 4)]["match_frac"] >= 0.5


def test_single_shared_frame_does_not_pair(spark):
    """A clip sharing ONE incidental frame with another must not pair:
    min_match_frac gates clip pairs, not frame pairs."""
    from delta_lake_optimizations_spark.operators.videodedup import _clip_frames

    a = _clip_frames(4000)
    b = _clip_frames(5000)
    b[3] = a[7]  # one stolen frame out of 12
    rows = [
        (1, bytearray(gif_encode_frames(32, 32, 1, a))),
        (2, bytearray(gif_encode_frames(32, 32, 1, b))),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    assets = spark.createDataFrame(rows, schema)
    hashes = video_frame_hashes(assets)
    assert video_near_pairs(hashes, min_match_frac=0.5).count() == 0
    # ...but the frame-level evidence exists below the clip gate
    low = video_near_pairs(hashes, min_match_frac=0.0).collect()
    assert len(low) == 1 and low[0]["n_matched"] == 1


def test_video_gif_near_dup_oracle_parity(spark, duck):
    qd = _DEFS["video_gif_near_dup"]
    compare_spark_duckdb(qd.fn(spark, SF_DIR), duck, qd.oracle)
