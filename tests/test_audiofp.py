"""Stdlib WAV PCM codec + energy-envelope audio near-dup: decode
round-trip, the committed real fixture, gain invariance, fingerprint
separation, operator totality on mixed corpora, and the registered
query's ground-truth duplicate map."""

from __future__ import annotations

import os

import numpy as np
import pytest

from delta_lake_optimizations_spark.operators.audiofp import (
    _RATE,
    _fixture_samples,
    audio_fingerprint64,
    audio_fingerprint_near_dup,
    audio_fingerprints,
    synthetic_audio_assets,
    wav_decode,
    wav_encode,
)

_MEDIA = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_wav_roundtrip_and_committed_fixture():
    s = _fixture_samples(40)
    rate, ch, out = wav_decode(wav_encode(_RATE, 1, s))
    assert (rate, ch) == (_RATE, 1) and out == s
    with open(os.path.join(_MEDIA, "tone.wav"), "rb") as fh:
        rate, ch, samples = wav_decode(fh.read())
    assert rate == 8000 and ch == 1 and len(samples) == 2000
    with pytest.raises(ValueError):
        wav_decode(b"definitely not a wav")
    with open(os.path.join(_MEDIA, "tiny.png"), "rb") as fh:
        with pytest.raises(ValueError):
            wav_decode(fh.read())


def test_fingerprint_gain_invariance_and_separation():
    base = _fixture_samples(40)
    f0 = audio_fingerprint64(base)
    # uniform gain changes move every window energy AND the median
    # identically -> identical fingerprint
    for gain in (0.25, 0.5, 2.0):
        scaled = [int(x * gain) for x in base]
        assert _ham(f0, audio_fingerprint64(scaled)) == 0, gain
    # distinct envelope rhythms are far apart
    for seed in (96, 97, 98):
        other = audio_fingerprint64(_fixture_samples(seed))
        assert _ham(f0, other) >= 10, seed


def test_audio_fingerprints_operator_mixed_corpus(spark):
    assets = synthetic_audio_assets(spark)
    junk = spark.createDataFrame(
        [(99, bytearray(b"not audio"))], assets.schema
    )
    got = {
        r["doc_id"]: r
        for r in audio_fingerprints(assets.unionByName(junk)).collect()
    }
    assert got[99]["decoder"] == "none" and got[99]["fingerprint"] is None
    assert got[0]["decoder"] == "wav-pcm"
    assert got[0]["sample_rate"] == _RATE
    assert got[0]["fingerprint"] == audio_fingerprint64(_fixture_samples(40))


def test_registered_query_ground_truth(spark):
    got = [
        (r["clip_a"], r["clip_b"])
        for r in audio_fingerprint_near_dup(spark, "/unused").collect()
    ]
    assert got == [(0, 3), (1, 4), (2, 5)]


def test_banded_pairs_match_exhaustive(spark):
    from delta_lake_optimizations_spark.operators.imagehash import (
        phash_near_pairs,
    )

    fps = audio_fingerprints(synthetic_audio_assets(spark))
    rows = {r["doc_id"]: r["fingerprint"] for r in fps.collect()}
    import itertools

    want = sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if _ham(rows[a], rows[b]) <= 6
    )
    got = sorted(
        (r["img_a"], r["img_b"])
        for r in phash_near_pairs(
            fps, max_hamming=6, hash_col="fingerprint"
        ).collect()
    )
    assert got == want == [(0, 3), (1, 4), (2, 5)]


def test_fingerprint_noise_robustness():
    base = np.asarray(_fixture_samples(41), dtype=np.float64)
    f0 = audio_fingerprint64([int(x) for x in base])
    rng = np.random.default_rng(5)
    noisy = [
        int(x) for x in np.clip(base + rng.normal(0, 600, base.size), -32768, 32767)
    ]
    assert _ham(f0, audio_fingerprint64(noisy)) <= 3
