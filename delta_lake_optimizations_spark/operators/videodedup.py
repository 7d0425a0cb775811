"""Video near-dup via frame sampling + perceptual frame hashes
(SURVEY §2.9 X4 video extension).

Multimodal training corpora need video dedup exactly like image dedup:
the same clip recirculates re-encoded, trimmed, or brightness-shifted.
The pipeline shape is public knowledge (frame-sample -> per-frame
perceptual hash -> match clips whose sampled frames collapse); the
sandbox ships no media library, but animated GIF is a real multi-frame
container decodable from scratch (``imagehash.gif_decode_frames`` —
stdlib LZW), so the whole path runs on REAL decoded frames end to end.
The moment an MP4/H.264 decoder exists, only the decode call changes.

Scale shape (100 TB):

- ``video_frame_hashes``: ONE Arrow-batched ``mapInPandas`` pass
  (map-only, no exchange) decoding each payload once and emitting
  ``max_frames`` sampled frame rows — output is ~24 bytes/frame, so the
  shuffle-facing volume is thousands of times smaller than the videos.
- ``video_near_pairs``: frame hashes band into 16-bit chunks (the exact
  SimHash/image scheme — pigeonhole: frame pairs within Hamming 3
  always share a band), candidates equi-join on the band bucket, then
  per-clip-pair match counting is one hash aggregate. No cross join at
  any granularity; a clip pair is compared only when at least one
  frame pair collides.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.imagehash import (
    DECODE_ERRORS,
    _fixture_pixels,
    ahash64,
    banded_candidates,
    gif_decode_frames,
    gif_encode_frames,
)
from delta_lake_optimizations_spark.registry import query

FRAME_HASH_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, width int, height int, "
    "ahash bigint, decoder string"
)


def video_frame_hashes(
    assets: DataFrame,
    id_col: str = "doc_id",
    every_n: int = 1,
    max_frames: int = 16,
) -> DataFrame:
    """Per-sampled-frame perceptual hashes for multi-frame payloads:
    decode (animated GIF — the stdlib-decodable container), keep every
    ``every_n``-th frame up to ``max_frames``, aHash each on the full
    canvas. Non-decodable payloads yield one ``decoder='none'`` row with
    NULL hash — the pipeline stays total on mixed corpora."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, nfr, ws, hs, ah, dec = [], [], [], [], [], [], []
            for vid, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    w, h, frames = gif_decode_frames(bytes(p))
                except DECODE_ERRORS:
                    ids.append(vid)
                    fidx.append(None)
                    nfr.append(None)
                    ws.append(None)
                    hs.append(None)
                    ah.append(None)
                    dec.append("none")
                    continue
                sampled = frames[::every_n][:max_frames]
                for i, rgb in enumerate(sampled):
                    ids.append(vid)
                    fidx.append(i * every_n)
                    nfr.append(len(sampled))
                    ws.append(w)
                    hs.append(h)
                    ah.append(ahash64(w, h, 3, rgb))
                    dec.append("gif-lzw")
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(fidx, dtype="Int32"),
                    "n_frames": pd.array(nfr, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "ahash": pd.array(ah, dtype="Int64"),
                    "decoder": dec,
                }
            )

    return assets.mapInPandas(hash_batches, schema=FRAME_HASH_SCHEMA)


def video_near_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 6,
    min_match_frac: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Clip-level near-dup pairs: frames collide through Hamming bands
    sized to ``max_hamming`` (the image/SimHash candidate scheme —
    ``bands_for_hamming`` guarantees candidate recall at the filter
    radius, ADVICE r9), a frame PAIR matches at Hamming <=
    ``max_hamming``, and a CLIP pair survives when matched frames cover
    >= ``min_match_frac`` of the shorter clip's sampled frames — trimmed
    or re-encoded copies collapse, clips sharing one incidental frame do
    not."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        bands_for_hamming,
    )

    sigs = frame_hashes.filter(F.col("ahash").isNotNull()).select(
        F.col(id_col).alias("_vid"),
        F.col("frame_idx").alias("_fidx"),
        F.col("n_frames").alias("_nf"),
        F.col("ahash").alias("_sig"),
    )
    cand = banded_candidates(
        sigs, id_col="_vid", sig_col="_sig", carry=("_fidx", "_nf"),
        n_bands=bands_for_hamming(max_hamming),
    )
    hamming = F.bit_count(F.col("_sig").bitwiseXOR(F.col("_sig2")))
    matched = cand.filter(hamming <= F.lit(max_hamming))
    agg = matched.groupBy("_vid", "_vid2").agg(
        F.countDistinct("_fidx").alias("_ma"),
        F.countDistinct("_fidx2").alias("_mb"),
        F.first("_nf").alias("_na"),
        F.first("_nf2").alias("_nb"),
    )
    frac = F.round(
        F.least(F.col("_ma"), F.col("_mb")).cast("double")
        / F.least(F.col("_na"), F.col("_nb")),
        6,
    )
    return (
        agg.withColumn("match_frac", frac)
        .filter(F.col("match_frac") >= F.lit(min_match_frac))
        .select(
            F.col("_vid").alias("video_a"),
            F.col("_vid2").alias("video_b"),
            F.least(F.col("_ma"), F.col("_mb")).cast("int").alias("n_matched"),
            "match_frac",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic fixture corpus with a KNOWN duplicate map: animated GIFs
# built from the image fixtures' seeded patterns.
# ---------------------------------------------------------------------------

_N_FRAMES = 12
_SIZE = 32


def _clip_frames(base_seed: int) -> list[bytes]:
    return [
        _fixture_pixels(seed=base_seed + 17 * j).tobytes()
        for j in range(_N_FRAMES)
    ]


def synthetic_video_assets(spark: SparkSession) -> DataFrame:
    """10 animated GIFs (12 frames, 32x32): 4 base clips, 3 near-dup
    copies, 3 unrelated. Ground truth pairs: (0,4) brightness-shifted
    re-encode, (1,5) TRIMMED copy (drops the first 4 frames — 8/12
    frames shared, match_frac 1.0 on the shorter clip), (2,6) verbatim
    re-encode. Clip 3 and 7..9 pair with nothing."""
    import numpy as np

    clips: dict[int, list[bytes]] = {}
    for i in range(4):
        clips[i] = _clip_frames(1000 + 97 * i)
    rng = np.random.default_rng(11)
    clips[4] = [
        np.clip(
            np.frombuffer(f, np.uint8).reshape(_SIZE, _SIZE).astype(np.float64)
            + 4
            + rng.normal(0, 8, (_SIZE, _SIZE)),
            0,
            255,
        )
        .astype(np.uint8)
        .tobytes()
        for f in clips[0]
    ]
    clips[5] = clips[1][4:]  # trimmed: frames 4..11 survive
    clips[6] = list(clips[2])  # verbatim re-encode
    for i in range(7, 10):
        clips[i] = _clip_frames(9000 + 31 * i)
    rows = [
        (i, bytearray(gif_encode_frames(_SIZE, _SIZE, 1, clips[i])))
        for i in sorted(clips)
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "video_gif_near_dup",
    tags=("multimodal", "dedup", "video", "llm-pipeline"),
    oracle="""
        SELECT video_a, video_b
        FROM (VALUES
            (CAST(0 AS BIGINT), CAST(4 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(5 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(6 AS BIGINT))
        ) AS t(video_a, video_b)
    """,
)
def video_gif_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup over the deterministic animated-GIF fixture corpus:
    stdlib multi-frame decode -> per-frame aHash -> banded frame-pair
    candidates -> clip pairs covering >= half the shorter clip. The
    oracle is the corpus's ground-truth duplicate map (includes a
    TRIMMED copy — the case doc-level byte hashing can never catch);
    independent of ``sf_dir`` by design — codec+pipeline conformance,
    not corpus analysis."""
    assets = synthetic_video_assets(spark)
    hashes = video_frame_hashes(assets)
    return (
        video_near_pairs(hashes, max_hamming=6, min_match_frac=0.5)
        .select("video_a", "video_b")
        .orderBy("video_a", "video_b")
    )
