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


# ---------------------------------------------------------------------------
# Spectral fingerprint (round 9): margins per duplicate class, rhythm-vs-
# frequency complementarity, totality, and oracle parity.
# ---------------------------------------------------------------------------


def _sham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_spectral_margins_per_class():
    import itertools

    import numpy as np

    from delta_lake_optimizations_spark.operators.audiofp import (
        _RATE,
        _rich_fixture_samples,
        spectral_fingerprint64,
    )

    clips = {i: _rich_fixture_samples(seed=700 + i) for i in range(3)}
    clips[3] = [int(x * 0.5) for x in clips[0]]
    rng = np.random.default_rng(5)
    a1 = np.asarray(clips[1], float)
    clips[4] = [
        int(x) for x in np.clip(a1 + rng.normal(0, 220, a1.size), -32768, 32767)
    ]
    clips[5] = list(clips[2])
    for i in range(6, 9):
        clips[i] = _rich_fixture_samples(seed=1700 + 31 * i)
    fp = {i: spectral_fingerprint64(s, _RATE) for i, s in clips.items()}
    for a, b in [(0, 3), (1, 4), (2, 5)]:
        assert _sham(fp[a], fp[b]) <= 2, (a, b)
    for a, b in itertools.combinations(range(9), 2):
        if (a, b) not in [(0, 3), (1, 4), (2, 5)]:
            assert _sham(fp[a], fp[b]) >= 14, (a, b)


def test_spectral_and_envelope_are_complementary():
    """A clip with the SAME amplitude rhythm but different frequencies
    fools the envelope fingerprint and not the spectral one."""
    import numpy as np

    from delta_lake_optimizations_spark.operators.audiofp import (
        _RATE,
        audio_fingerprint64,
        spectral_fingerprint64,
    )

    n = 8000
    t = np.arange(n) / _RATE
    env = 0.55 + 0.45 * np.sign(np.sin(2 * np.pi * 4.0 * t))
    a = [int(x) for x in env * np.sin(2 * np.pi * 300 * t) * 11000]
    b = [int(x) for x in env * np.sin(2 * np.pi * 2400 * t) * 11000]
    assert _sham(audio_fingerprint64(a), audio_fingerprint64(b)) <= 6
    assert _sham(
        spectral_fingerprint64(a, _RATE), spectral_fingerprint64(b, _RATE)
    ) >= 8


def test_audio_fingerprints_carries_both_columns(spark):
    from delta_lake_optimizations_spark.operators.audiofp import (
        audio_fingerprints,
        synthetic_spectral_audio_assets,
    )

    rows = audio_fingerprints(synthetic_spectral_audio_assets(spark)).collect()
    assert all(
        r["fingerprint"] is not None and r["spectral_fp"] is not None
        for r in rows
    )
    # clip 9 is the r11 FLAC re-encode of clip 0; the rest are WAV
    decs = {r["doc_id"]: r["decoder"] for r in rows}
    assert decs[9] == "flac"
    assert all(v == "wav-pcm" for k, v in decs.items() if k != 9)
    # the FLAC copy decodes to bit-identical samples -> identical prints
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[9]["fingerprint"] == by_id[0]["fingerprint"]
    assert by_id[9]["spectral_fp"] == by_id[0]["spectral_fp"]
    assert by_id[9]["n_samples"] == by_id[0]["n_samples"]


def test_audio_spectral_near_dup_oracle_parity(spark, duck):
    from delta_lake_optimizations_spark.registry import registry

    from .conftest import SF_DIR, compare_spark_duckdb

    qd = registry()["audio_spectral_near_dup"]
    compare_spark_duckdb(qd.fn(spark, SF_DIR), duck, qd.oracle)
