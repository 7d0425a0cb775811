"""Baseline JPEG codec from scratch (stdlib + numpy — no media library).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), DQT/DHT parsed from the
stream, restart markers honored, byte-stuffing unstuffed, per-component
DC prediction, run-length AC, dezigzag, dequantize, orthonormal 8x8
IDCT, nearest-neighbour chroma upsample, BT.601 YCbCr->RGB. Progressive
(SOF2), arithmetic coding, and 12-bit inputs refuse with ``ValueError``
— the cascade falls back to the header probe for those.

Encoder: baseline 4:4:4 (or grayscale) with libjpeg-style
quality-scaled Annex-K quantization matrices and FLAT canonical Huffman
tables (every DC symbol 5 bits, every AC symbol 8 bits — any prefix
code is legal in a DHT segment; flat sidesteps transcribing the 162-
entry Annex-K code lengths and costs only file size). Exists so the
decoder can be conformance-tested by lossy round trip without any
external reference: encode known pixels at high quality, decode, bound
the per-pixel error.

The JPEG format details implemented here (marker layout, canonical
Huffman reconstruction from BITS/HUFFVAL, EXTEND sign rule, zigzag
order, IDCT normalization) are from the public ITU T.81 spec.

Why it matters for the pipeline: JPEG is the dominant web image
container; with this module the perceptual-hash near-dup stack
(``operators/imagehash.py``) hashes REAL pixels for PNG, BMP, GIF and
JPEG — the same picture recirculating across ALL four collapses, even
across the lossy boundary (pinned by ``image_cross_format_near_dup``
and ``tests/test_jpegcodec.py::test_lossy_hash_proximity``).
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II matrix: IDCT = M.T @ F @ M, FDCT = M @ f @ M.T
_DCT_M = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex-K base quantization matrices (natural order)
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)
_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol from a DHT's BITS/HUFFVAL (T.81 C.2)."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first entropy-coded-segment reader: unstuffs 0xFF00, stops at
    markers, resynchronizes across RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                b = 0xFF  # pad past end: fill bits are 1s (T.81 F.1.2.3)
            else:
                b = d[self.pos]
                if b == 0xFF:
                    nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2  # stuffed data byte
                    else:
                        # marker (RSTn or scan end): do NOT consume; pad
                        # with 1-bits so a straddling final symbol
                        # completes; sync_restart finds the marker here
                        b = 0xFF
                else:
                    self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        if self.n < k:
            raise ValueError("JPEG entropy stream exhausted")
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Discard bit remainder, consume the RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(w, h, nch, pixels)`` (RGB or gray,
    top-down) — the ``png_decode`` contract."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    scan_pos = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # TEM / RSTn / SOI: standalone markers, no length field
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG")
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(body[i : i + 64], np.uint8).astype(np.float64)
                    i += 64
                else:
                    tbl = np.frombuffer(
                        body[i : i + 128], ">u2"
                    ).astype(np.float64)
                    i += 128
                nat = np.empty(64)
                nat[_ZIGZAG] = tbl
                qt[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _canonical_codes(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            h, w = struct.unpack_from(">HH", body, 1)
            if w <= 0 or h <= 0 or w * h > (1 << 26):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, sampling, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {
                        "id": cid,
                        "hs": sampling >> 4,
                        "vs": sampling & 0x0F,
                        "q": qid,
                    }
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for s in range(ns):
                cid, tids = body[1 + 2 * s], body[2 + 2 * s]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tids >> 4
                        c["ac"] = tids & 0x0F
            scan_pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan_pos is None or not comps or w == 0:
        raise ValueError("truncated JPEG")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        planes[c["id"]] = np.zeros((c["bh"] * 8, c["bw"] * 8))
        c["pred"] = 0
    rd = _BitReader(data, scan_pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.sync_restart()
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coeff = np.zeros(64)
                        sym = rd.huff(huff_dc[c["dc"]])
                        diff = _extend(rd.bits(sym), sym) if sym else 0
                        c["pred"] += diff
                        coeff[0] = c["pred"]
                        k = 1
                        while k < 64:
                            sym = rd.huff(huff_ac[c["ac"]])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad JPEG AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC overflow")
                            coeff[k] = _extend(rd.bits(size), size)
                            k += 1
                        nat = np.empty(64)
                        nat[_ZIGZAG] = coeff
                        block = nat.reshape(8, 8) * qt[c["q"]]
                        spat = _DCT_M.T @ block @ _DCT_M + 128.0
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spat
    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    if len(full) != 3:
        raise ValueError("unsupported JPEG component count")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=-1,
    )
    return w, h, 3, rgb.tobytes()


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 / grayscale, flat Huffman tables)
# ---------------------------------------------------------------------------

_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _flat_table(syms: list[int], length: int) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL giving every symbol the same code length (legal as
    long as count < 2^length; canonical codes then never hit all-ones)."""
    if len(syms) >= (1 << length):
        raise ValueError("flat table too small")
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, list(syms)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.bits((1 << pad) - 1, pad)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * scale + 50) / 100), 1, 255)


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Baseline JPEG from top-down gray or RGB pixels (flat Huffman;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs;
    ``subsampling='420'`` box-averages chroma 2x2 and interleaves
    16x16-pixel MCUs — the layout most web JPEGs use, and the encoder
    path that exercises the decoder's multi-block-per-MCU sampling
    logic). Lossy by nature — exists for decoder conformance testing
    and for building mixed-container fixture corpora."""
    if channels not in (1, 3):
        raise ValueError("jpeg_encode supports 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    a = np.frombuffer(pixels, np.uint8).reshape(height, width, channels).astype(
        np.float64
    )
    if channels == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
        qids = [0, 1, 1]
    else:
        chans = [a[:, :, 0]]
        qids = [0]
    qtabs = [
        _quality_scale(_Q_LUM, quality),
        _quality_scale(_Q_CHROM, quality),
    ][: max(qids) + 1]
    if channels == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * len(chans)
    hmax = max(hs for hs, _ in samp)
    vmax = max(vs for _, vs in samp)
    mcux, mcuy = -(-width // (8 * hmax)), -(-height // (8 * vmax))

    def _pad_edge(ch: np.ndarray, th: int, tw: int) -> np.ndarray:
        p = np.empty((th, tw))
        h0, w0 = ch.shape
        p[:h0, :w0] = ch
        p[h0:, :w0] = ch[-1:, :]  # edge-replicate padding
        p[:, w0:] = p[:, w0 - 1 : w0]
        return p

    padded = []
    for ci, ch in enumerate(chans):
        hs, vs = samp[ci]
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            # 2x2 box-average chroma downsample (pad to the factor first)
            full = _pad_edge(ch, -(-height // ry) * ry, -(-width // rx) * rx)
            ch = full.reshape(
                full.shape[0] // ry, ry, full.shape[1] // rx, rx
            ).mean(axis=(1, 3))
        padded.append(_pad_edge(ch, mcuy * vs * 8, mcux * hs * 8))

    dc_bits, dc_vals = _flat_table(_DC_SYMS, 5)
    ac_bits, ac_vals = _flat_table(_AC_SYMS, 8)
    dc_code = _canonical_codes(dc_bits, dc_vals)
    ac_code = _canonical_codes(ac_bits, ac_vals)
    dc_enc = {sym: (ln, code) for (ln, code), sym in dc_code.items()}
    ac_enc = {sym: (ln, code) for (ln, code), sym in ac_code.items()}

    wtr = _BitWriter()
    preds = [0] * len(chans)

    def emit_block(ch: np.ndarray, ci: int, y0: int, x0: int) -> None:
        block = ch[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coeff = _DCT_M @ block @ _DCT_M.T
        qz = np.round(coeff / qtabs[qids[ci]]).astype(np.int64)
        zz = qz.reshape(-1)[_ZIGZAG]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        size = _size_of(diff)
        ln, code = dc_enc[size]
        wtr.bits(code, ln)
        if size:
            wtr.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_enc[0xF0]
                wtr.bits(code, ln)
                run -= 16
            size = _size_of(v)
            ln, code = ac_enc[(run << 4) | size]
            wtr.bits(code, ln)
            wtr.bits(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            ln, code = ac_enc[0x00]
            wtr.bits(code, ln)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                wtr.flush()
                wtr.out += bytes(
                    (0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8)
                )
                preds = [0] * len(chans)
            mcu_count += 1
            for ci, ch in enumerate(padded):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        emit_block(
                            ch, ci, (my * vs + by) * 8, (mx * hs + bx) * 8
                        )
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qtabs):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes((tid,)) + zz)
    sof = struct.pack(">BHHB", 8, height, width, len(chans))
    for ci in range(len(chans)):
        hs, vs = samp[ci]
        sof += bytes((ci + 1, (hs << 4) | vs, qids[ci]))
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes((0x00,)) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes((0x10,)) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes((len(chans),))
    for ci in range(len(chans)):
        sos += bytes((ci + 1, 0x00))
    sos += bytes((0, 63, 0))
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
