"""Audio fingerprint near-dup (SURVEY §2.9 X4 audio leg — the WAV
analogue of ``imagehash``'s PNG move): PCM sample decode with NOTHING
but the standard library (RIFF chunk walk + ``struct`` int16 frames),
a 64-bit energy-envelope fingerprint, and Hamming-banded near-dup
pairing reusing the image side's band scheme verbatim.

Why this fingerprint: per-window RMS energy thresholded at the MEDIAN is
invariant to uniform gain (volume) changes and robust to low-level noise
— re-encoded/re-mastered copies of the same recording collapse, distinct
recordings don't (margins pinned by pytest on the fixture corpus). It is
the simplest member of the public acoustic-fingerprint family
(Haitsma-Kalker 2002's energy-band signs are the canonical reference);
the banding/pairing plumbing is codec- and fingerprint-agnostic, so a
spectral variant drops in without touching the pair path.

Scale shape (100 TB): decode+fingerprint is one Arrow-batched
``mapInPandas`` pass (map-only, no exchange); pairing reuses
``imagehash.phash_near_pairs`` — 16-bit band buckets, equi-join, exact
``bit_count(xor)`` tail, no cross join anywhere.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.registry import query


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a 16-bit PCM WAV with only the stdlib: RIFF chunk walk for
    ``fmt `` (format 1 = PCM, 16-bit) and ``data`` (interleaved LE int16
    frames). Returns ``(sample_rate, channels, samples)`` with samples
    channel-interleaved. Raises ``ValueError`` for non-WAV bytes or
    non-PCM-16 encodings."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = fmt = None
    frames: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            frames = body
    if rate is None or frames is None:
        raise ValueError("WAV without fmt/data chunks")
    if fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (fmt={fmt}, bits={bits})")
    n = len(frames) // 2
    samples = list(struct.unpack(f"<{n}h", frames[: n * 2]))
    return rate, channels, samples


def wav_encode(rate: int, channels: int, samples: list[int]) -> bytes:
    """Minimal deterministic 16-bit PCM WAV writer — round-trips the
    decoder and builds the fixture corpus."""
    frames = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(frames).to_bytes(4, "little") + frames
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_decode(data: bytes) -> tuple[int, int, list[int], str]:
    """Container-dispatching PCM decode: RIFF/WAVE 16-bit PCM first, then
    FLAC (``operators/flaccodec.py`` — r11: lossless crawl audio joins
    the fingerprint path; a FLAC copy decodes to BIT-IDENTICAL samples,
    so it collapses with its WAV twin by construction). Returns
    ``(rate, channels, samples, decoder_name)``; ValueError on anything
    else."""
    try:
        rate, ch, samples = wav_decode(data)
        return rate, ch, samples, "wav-pcm"
    except ValueError:
        pass
    from delta_lake_optimizations_spark.operators.flaccodec import (
        flac_decode,
    )

    rate, ch, samples = flac_decode(data)
    return rate, ch, samples, "flac"


def audio_fingerprint64(samples: list[int], n_windows: int = 64) -> int:
    """64-bit energy-envelope fingerprint: split the sample stream into
    ``n_windows`` equal windows, bit i set where window i's RMS energy
    beats the MEDIAN window energy — gain-invariant (uniform scaling
    moves every energy and the median identically) and noise-robust."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if a.size == 0:
        return 0
    edges = (np.arange(n_windows + 1) * a.size) // n_windows
    energy = np.array(
        [
            math.sqrt(float(np.mean(np.square(a[edges[i] : edges[i + 1]]))))
            if edges[i + 1] > edges[i]
            else 0.0
            for i in range(n_windows)
        ]
    )
    med = float(np.median(energy))
    v = 0
    for i, e in enumerate(energy):
        if e > med:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v  # signed long for Spark


def spectral_fingerprint64(
    samples: list[int],
    rate: int,
    n_segments: int = 4,
    n_bands: int = 16,
    activity: float = 0.25,
) -> int:
    """64-bit SPECTRAL fingerprint (Haitsma-Kalker-family band-energy
    signature, simplified to a whole-clip form): the clip splits into
    ``n_segments`` time segments; each segment's Hann-windowed power
    spectrum integrates into ``n_bands`` log-spaced bands (100 Hz ..
    0.45*rate); bit ``s*16 + b`` is set where band energy exceeds
    ``activity`` times the segment's MEAN band energy — a spectral
    activity detector. The mean reference is dominated by the energetic
    bands, so the threshold sits far from both the active bands and the
    leakage/noise floor: gain-invariant (scaling moves energies and
    mean identically) and robust to broadband noise and requantization
    (pinned: gain-halved, sigma=2%-noised and re-encoded copies measure
    Hamming 0 on the fixture corpus; distinct clips >= 16 over a
    30-clip sweep). Design note: a median reference or adjacent-band
    differences (tried first) put the decision point INSIDE the
    near-empty-band noise floor, where any perturbation reshuffles the
    order and flips ~20/64 bits. Unlike the envelope fingerprint
    (amplitude RHYTHM), this keys on FREQUENCY CONTENT — the two catch
    different duplicate classes."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if a.size < 2 * n_segments:
        return 0
    edges = np.logspace(np.log10(100.0), np.log10(0.45 * rate), n_bands + 1)
    v = 0
    seg_bounds = (np.arange(n_segments + 1) * a.size) // n_segments
    for s in range(n_segments):
        seg = a[seg_bounds[s] : seg_bounds[s + 1]]
        spec = np.abs(np.fft.rfft(seg * np.hanning(seg.size))) ** 2
        freqs = np.fft.rfftfreq(seg.size, 1.0 / rate)
        e = np.array(
            [
                float(spec[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum())
                for b in range(n_bands)
            ]
        )
        thr = activity * float(e.mean())
        for b in range(n_bands):
            if e[b] > thr:
                v |= 1 << (s * 16 + b)
    return v - (1 << 64) if v >= 1 << 63 else v  # signed long for Spark


AUDIO_FP_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, fingerprint bigint, "
    "spectral_fp bigint, decoder string"
)


def audio_fingerprints(assets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode+fingerprint over a binary payload column:
    PCM-16 WAV and FLAC bytes get the real path (``audio_decode``
    dispatches on container); anything else yields NULL with
    ``decoder='none'`` (total on mixed corpora, like ``image_hashes``)."""

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, fps, sps, dec = [], [], [], [], []
            for p in pdf["payload"]:
                # compute everything before appending (the image_hashes
                # alignment lesson)
                try:
                    rate, _ch, samples, codec = audio_decode(bytes(p))
                    row = (
                        rate,
                        len(samples),
                        audio_fingerprint64(samples),
                        spectral_fingerprint64(samples, rate),
                        codec,
                    )
                except (ValueError, struct.error, IndexError):
                    row = (None, None, None, None, "none")
                rates.append(row[0])
                counts.append(row[1])
                fps.append(row[2])
                sps.append(row[3])
                dec.append(row[4])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int64"),
                    "fingerprint": pd.array(fps, dtype="Int64"),
                    "spectral_fp": pd.array(sps, dtype="Int64"),
                    "decoder": dec,
                }
            )

    return assets.mapInPandas(fp_batches, schema=AUDIO_FP_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fixture corpus with a KNOWN duplicate map (the image
# pattern): base clips are seeded sine mixtures with distinct envelope
# rhythms; near-dups are gain-scaled / lightly-noised re-encodes.
# ---------------------------------------------------------------------------

_RATE = 8000
_N = 8000  # 1 second


def _fixture_samples(seed: int) -> list[int]:
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.arange(_N) / _RATE
    f1, f2 = rng.uniform(200, 1200, size=2)
    # distinct amplitude rhythm per clip: seeded on/off envelope
    env_rate = rng.uniform(2.0, 9.0)
    phase = rng.uniform(0, 2 * np.pi)
    env = 0.55 + 0.45 * np.sign(np.sin(2 * np.pi * env_rate * t + phase))
    wave = env * (0.6 * np.sin(2 * np.pi * f1 * t) + 0.4 * np.sin(2 * np.pi * f2 * t))
    return [int(x) for x in np.clip(wave * 12000, -32768, 32767)]


def synthetic_audio_assets(spark: SparkSession) -> DataFrame:
    """9 WAV clips: 3 bases, 3 perturbed copies (half gain on one; +2%
    uniform noise on another; byte re-encode on the third), 3 unrelated.
    Ground truth: (0,3), (1,4), (2,5) are the only near-dup pairs."""
    import numpy as np

    clips = {i: _fixture_samples(seed=40 + i) for i in range(3)}
    # 3: base 0 at half volume (gain invariance)
    clips[3] = [int(x * 0.5) for x in clips[0]]
    # 4: base 1 with 2% noise
    rng = np.random.default_rng(11)
    a1 = np.asarray(clips[1], dtype=np.float64)
    clips[4] = [
        int(x)
        for x in np.clip(a1 + rng.normal(0, 0.02 * 12000, a1.size), -32768, 32767)
    ]
    # 5: base 2 re-encoded verbatim
    clips[5] = list(clips[2])
    for i in range(6, 9):
        clips[i] = _fixture_samples(seed=90 + i)
    from pyspark.sql import types as T

    rows = [
        (i, bytearray(wav_encode(_RATE, 1, clips[i]))) for i in sorted(clips)
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "audio_fingerprint_near_dup",
    tags=("multimodal", "dedup", "audio", "llm-pipeline"),
    oracle="""
        SELECT clip_a, clip_b
        FROM (VALUES
            (CAST(0 AS BIGINT), CAST(3 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(4 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(5 AS BIGINT))
        ) AS t(clip_a, clip_b)
    """,
)
def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup over the deterministic WAV fixture corpus: stdlib
    PCM decode -> energy-envelope fingerprint -> 16-bit-band candidate
    join (the image/simhash scheme) -> Hamming <= 6. The oracle is the
    corpus's ground-truth duplicate map; independent of ``sf_dir`` by
    design — codec+fingerprint conformance, not corpus analysis."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        phash_near_pairs,
    )

    assets = synthetic_audio_assets(spark)
    fps = audio_fingerprints(assets)
    return (
        phash_near_pairs(fps, max_hamming=6, hash_col="fingerprint")
        .select(
            F.col("img_a").alias("clip_a"), F.col("img_b").alias("clip_b")
        )
        .orderBy("clip_a", "clip_b")
    )


def _rich_fixture_samples(seed: int) -> list[int]:
    """Spectrally RICH non-stationary clip for the spectral query: four
    time segments, each a fresh seeded mixture of 6 sinusoids with
    log-uniform frequencies (150-3000 Hz) — a 'melody' whose band
    pattern changes per segment, so all 64 spectral bits carry
    information (a stationary clip repeats the same 16 bits four
    times and halves the non-dup margin)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    segs = []
    for _ in range(4):
        t = np.arange(_N // 4) / _RATE
        freqs = np.exp(rng.uniform(np.log(150), np.log(3000), 6))
        amps = rng.uniform(0.4, 1.0, 6)
        ph = rng.uniform(0, 2 * np.pi, 6)
        segs.append(
            sum(
                a * np.sin(2 * np.pi * f * t + p)
                for f, a, p in zip(freqs, amps, ph)
            )
        )
    w = np.concatenate(segs)
    return [
        int(x) for x in np.clip(w / np.abs(w).max() * 11000, -32768, 32767)
    ]


def synthetic_spectral_audio_assets(spark: SparkSession) -> DataFrame:
    """10 clips for the spectral fingerprint: 3 rich bases, 3 copies
    (half gain; 2% broadband noise; verbatim re-encode), 3 unrelated,
    and — r11 — clip 9 is a FLAC re-encode of clip 0's exact samples
    (cross-CONTAINER dup: same PCM, different compressed bytes).
    Ground truth: (0,3), (0,9), (1,4), (2,5), (3,9) are the only
    near-dup pairs (all measure Hamming 0; distinct pairs >= 16)."""
    import numpy as np

    clips = {i: _rich_fixture_samples(seed=700 + i) for i in range(3)}
    clips[3] = [int(x * 0.5) for x in clips[0]]
    rng = np.random.default_rng(5)
    a1 = np.asarray(clips[1], dtype=np.float64)
    clips[4] = [
        int(x) for x in np.clip(a1 + rng.normal(0, 220, a1.size), -32768, 32767)
    ]
    clips[5] = list(clips[2])
    for i in range(6, 9):
        clips[i] = _rich_fixture_samples(seed=1700 + 31 * i)
    from pyspark.sql import types as T

    from delta_lake_optimizations_spark.operators.flaccodec import (
        flac_encode,
    )

    rows = [
        (i, bytearray(wav_encode(_RATE, 1, clips[i]))) for i in sorted(clips)
    ]
    rows.append((9, bytearray(flac_encode(_RATE, 1, clips[0]))))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "audio_spectral_near_dup",
    tags=("multimodal", "dedup", "audio", "llm-pipeline"),
    oracle="""
        SELECT clip_a, clip_b
        FROM (VALUES
            (CAST(0 AS BIGINT), CAST(3 AS BIGINT)),
            (CAST(0 AS BIGINT), CAST(9 AS BIGINT)),
            (CAST(1 AS BIGINT), CAST(4 AS BIGINT)),
            (CAST(2 AS BIGINT), CAST(5 AS BIGINT)),
            (CAST(3 AS BIGINT), CAST(9 AS BIGINT))
        ) AS t(clip_a, clip_b)
    """,
)
def audio_spectral_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup by SPECTRAL fingerprint over the rich fixture
    corpus: stdlib PCM decode (WAV + FLAC since r11 — clip 9 is a FLAC
    re-encode of clip 0, proving cross-container collapse through the
    lossless decode) -> FFT band-activity signature ->
    16-bit-band candidate join -> Hamming <= 6. Complements
    ``audio_fingerprint_near_dup`` (energy envelope): frequency content
    vs amplitude rhythm. Oracle = ground-truth duplicate map;
    independent of ``sf_dir`` by design."""
    from delta_lake_optimizations_spark.operators.imagehash import (
        phash_near_pairs,
    )

    assets = synthetic_spectral_audio_assets(spark)
    fps = audio_fingerprints(assets)
    return (
        phash_near_pairs(fps, max_hamming=6, hash_col="spectral_fp")
        .select(
            F.col("img_a").alias("clip_a"), F.col("img_b").alias("clip_b")
        )
        .orderBy("clip_a", "clip_b")
    )
