"""FLAC codec (operators/flaccodec.py): encoder<->decoder roundtrips,
hand-built streams for the decoder paths the encoder never emits (LPC,
mid/side + left/side + right/side decorrelation, partition orders,
escape-coded partitions, wasted bits), and truncation totality."""

from __future__ import annotations

import math
import random

import pytest

from delta_lake_optimizations_spark.operators.flaccodec import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    flac_decode,
    flac_encode,
)


def _tone(n, freq=0.05, amp=8000):
    return [int(amp * math.sin(i * freq)) for i in range(n)]


# ---------------------------------------------------------------------------
# Roundtrips (fixed predictors + verbatim fallback through the encoder)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "rate,ch,samples",
    [
        (8000, 1, [0] * 500),                       # constant block
        (8000, 1, _tone(9000)),                     # multi-frame tonal
        (44100, 2, _tone(7000)),                    # stereo
        (16000, 1, []),                             # empty stream
        (8000, 1, [-32768, 32767] * 100),           # full-range alternation
    ],
)
def test_roundtrip(rate, ch, samples):
    if len(samples) % ch:
        samples = samples[: len(samples) - len(samples) % ch]
    data = flac_encode(rate, ch, samples)
    assert flac_decode(data) == (rate, ch, samples)


def test_roundtrip_noise_hits_verbatim():
    rng = random.Random(1)
    samples = [rng.randrange(-32768, 32768) for _ in range(3000)]
    data = flac_encode(8000, 1, samples)
    assert flac_decode(data) == (8000, 1, samples)


def test_compression_actually_engages():
    samples = _tone(8192)
    data = flac_encode(8000, 1, samples)
    assert len(data) < 0.5 * 2 * len(samples)  # beats raw PCM 2x+


# ---------------------------------------------------------------------------
# Hand-built streams: decoder-only paths
# ---------------------------------------------------------------------------


def _streaminfo(rate, channels, bps, total):
    bw = _BitWriter()
    bw.write(64, 16)
    bw.write(64, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    bw.align()
    body = bw.bytes() + b"\x00" * 16  # md5 unknown
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(channels_payload, blocksize, chan_code, bps=16):
    """Assemble one frame: header + callback-built subframes + CRCs."""
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)            # 16-bit blocksize-1 follows
    bw.write(0, 4)            # rate from STREAMINFO
    bw.write(chan_code, 4)
    bw.write(4, 3)            # 16-bit samples
    bw.write(0, 1)
    for b in _utf8_coded(0):
        bw.write(b, 8)
    bw.write(blocksize - 1, 16)
    bw.write(_crc8(bytes(bw.buf)), 8)
    channels_payload(bw)
    bw.align()
    bw.write(_crc16(bytes(bw.buf)), 16)
    return bw.bytes()


def _verbatim_subframe(bw, vals, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in vals:
        bw.write(v, bps)


def test_lpc_subframe_decodes():
    """Order-2 LPC with shift: s[i] = ((2*s[i-1] - s[i-2]) >> 0) + r."""
    warm = [100, 103]
    res = [2, -1, 4, 0, -3, 1]
    expected = list(warm)
    for r in res:
        pred = (2 * expected[-1] - 1 * expected[-2]) >> 1
        expected.append(pred + r)
    n = len(expected)

    def payload(bw):
        bw.write(0, 1)
        bw.write(32 + (2 - 1), 6)  # LPC order 2
        bw.write(0, 1)
        for v in warm:
            bw.write(v, 16)
        bw.write(4 - 1, 4)      # precision 4 bits
        bw.write(1, 5)          # shift 1
        bw.write(2, 4)          # coef[0] = 2
        bw.write(-1, 4)         # coef[1] = -1
        bw.write(0, 2)          # rice method 0
        bw.write(0, 4)          # partition order 0
        bw.write(2, 4)          # rice param 2
        for r in res:
            bw.write_rice(r, 2)

    data = _streaminfo(8000, 1, 16, n) + _frame(payload, n, 0)
    rate, ch, samples = flac_decode(data)
    assert (rate, ch) == (8000, 1)
    assert samples == expected


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(mode):
    left = [100, 50, -30, 7, 0, 255, -100, 12]
    right = [90, 55, -20, 7, -5, 250, -90, 3]
    n = len(left)
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]

    def payload(bw):
        if mode == "left_side":
            _verbatim_subframe(bw, left, 16)
            _verbatim_subframe(bw, side, 17)
        elif mode == "right_side":
            _verbatim_subframe(bw, side, 17)
            _verbatim_subframe(bw, right, 16)
        else:
            _verbatim_subframe(bw, mid, 16)
            _verbatim_subframe(bw, side, 17)

    data = _streaminfo(8000, 2, 16, n) + _frame(payload, n, code)
    rate, ch, samples = flac_decode(data)
    assert samples == [v for pair in zip(left, right) for v in pair]


def test_partition_order_and_escape_partition():
    """Blocksize 8, order-1 fixed predictor, partition order 1: first
    partition rice-coded (3 residuals: 4 - order), second ESCAPED to
    6-bit raw values."""
    warm = [10]
    res = [1, -2, 3, 7, -8, 15, -16]
    expected = list(warm)
    for r in res:
        expected.append(expected[-1] + r)
    n = 8

    def payload(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)  # FIXED order 1
        bw.write(0, 1)
        bw.write(warm[0], 16)
        bw.write(0, 2)   # method 0
        bw.write(1, 4)   # partition order 1 -> two partitions of 4
        bw.write(3, 4)   # partition 1: rice param 3 (3 residuals)
        for r in res[:3]:
            bw.write_rice(r, 3)
        bw.write(15, 4)  # partition 2: ESCAPE
        bw.write(6, 5)   # 6-bit raw residuals
        for r in res[3:]:
            bw.write(r, 6)

    data = _streaminfo(8000, 1, 16, n) + _frame(payload, n, 0)
    assert flac_decode(data)[2] == expected


def test_wasted_bits_shift():
    vals = [4, 8, -12, 16, 0, 24]  # all divisible by 4 -> 2 wasted bits

    def payload(bw):
        bw.write(0, 1)
        bw.write(1, 6)   # VERBATIM
        bw.write(1, 1)   # wasted bits flag
        bw.write(1, 2)   # unary 1 -> k-1=1 -> 2 wasted bits
        for v in vals:
            bw.write(v >> 2, 14)

    n = len(vals)
    data = _streaminfo(8000, 1, 16, n) + _frame(payload, n, 0)
    assert flac_decode(data)[2] == vals


# ---------------------------------------------------------------------------
# Totality
# ---------------------------------------------------------------------------


def test_truncation_sweep_total():
    """Every strict prefix of a valid stream must raise ValueError —
    never hang, never return silently-wrong samples."""
    samples = _tone(600)
    data = flac_encode(8000, 1, samples)
    step = max(1, len(data) // 97)
    for cut in range(0, len(data), step):
        with pytest.raises(ValueError):
            flac_decode(data[:cut])


def test_corruption_trips_crc():
    samples = _tone(600)
    data = bytearray(flac_encode(8000, 1, samples))
    data[-10] ^= 0x55  # inside the last frame's payload
    with pytest.raises(ValueError):
        flac_decode(bytes(data))


def test_not_flac_refused():
    with pytest.raises(ValueError):
        flac_decode(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        flac_decode(b"")
