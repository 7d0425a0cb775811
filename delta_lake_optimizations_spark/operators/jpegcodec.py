"""Baseline + progressive JPEG codec from scratch (stdlib + numpy — no
media library).

Decoder: sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2, T.81
Annex G — VERDICT r09 #2: most large web photos are progressive, and
refusing them silently dropped those rows out of image near-dup), 8-bit,
grayscale or YCbCr with sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0),
DQT/DHT parsed from the stream, restart markers honored, byte-stuffing
unstuffed, per-component DC prediction, run-length AC, dezigzag,
dequantize, orthonormal 8x8 IDCT, nearest-neighbour chroma upsample,
BT.601 YCbCr->RGB. Progressive scans accumulate into per-component
coefficient arrays — DC first/refinement scans (G.1.2.1), AC spectral-
selection bands with EOB-run skips, and AC successive-approximation
refinement (G.1.2.3: correction bits for nonzero-history coefficients,
±1<<Al insertions) — then one vectorized dequantize+IDCT pass renders
the planes the baseline path builds block-by-block. Arithmetic coding,
hierarchical (SOF5-7/13-15), and 12-bit inputs refuse with
``ValueError`` — the cascade falls back to the header probe for those.

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


def _skip_to_marker(data: bytes, p: int) -> int:
    """Advance past a scan's entropy bytes to the next REAL marker (not a
    stuffed 0x00, not an RSTn the bit reader may have left behind)."""
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
            and data[p + 1] != 0xFF  # fill byte: the marker id follows
        ):
            return p
        p += 1
    return len(data)


def _nonint_grid(c: dict, w: int, h: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Block grid of a NON-interleaved scan (T.81 A.2.2): ceil over the
    component's own sample dimensions, which can be smaller than the
    interleaved MCU-padded grid the coefficient arrays are allocated on."""
    cw = -(-(w * c["hs"]) // hmax)
    ch = -(-(h * c["vs"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_prog_scan(
    rd: _BitReader,
    scan_comps: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff_dc: dict[int, dict],
    huff_ac: dict[int, dict],
    restart_interval: int,
    mcux: int,
    mcuy: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    coef: dict[int, "np.ndarray"],
) -> None:
    """One progressive scan (T.81 Annex G) accumulated into ``coef``
    (per-component ``(bh, bw, 64)`` int32 arrays, zigzag coefficient
    order). DC scans may be interleaved; AC scans are single-component
    by spec. ``eobrun`` (end-of-band run) is scan-local; restarts reset
    it and the DC predictions. The AC-refinement inner loop follows the
    T.81 G.1.2.3 flowchart (decode correction bits for every nonzero-
    history coefficient passed over; insert new ±1<<Al coefficients
    where the run ends; an EOB turns the rest of the band into pure
    corrections)."""
    eobrun = 0
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("bad progressive DC band")
        preds = {c["id"]: 0 for c in scan_comps}

        def dc_block(c: dict, by: int, bx: int) -> None:
            blk = coef[c["id"]][by, bx]
            if ah == 0:
                sym = rd.huff(huff_dc[c["dc"]])
                diff = _extend(rd.bits(sym), sym) if sym else 0
                preds[c["id"]] += diff
                blk[0] = preds[c["id"]] << al
            elif rd.bits(1):
                blk[0] = int(blk[0]) | (1 << al)

        cnt = 0
        if len(scan_comps) > 1:  # interleaved: MCU walk, restart per MCU
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        rd.sync_restart()
                        for cid in preds:
                            preds[cid] = 0
                    cnt += 1
                    for c in scan_comps:
                        for by in range(c["vs"]):
                            for bx in range(c["hs"]):
                                dc_block(c, my * c["vs"] + by, mx * c["hs"] + bx)
        else:
            c = scan_comps[0]
            nbx, nby = _nonint_grid(c, w, h, hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        rd.sync_restart()
                        preds[c["id"]] = 0
                    cnt += 1
                    dc_block(c, by, bx)
        return

    # AC scan: exactly one component (T.81 B.2.3)
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan_comps[0]
    actab = huff_ac[c["ac"]]
    grid = coef[c["id"]]
    nbx, nby = _nonint_grid(c, w, h, hmax, vmax)
    one = 1 << al
    cnt = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and cnt and cnt % restart_interval == 0:
                rd.sync_restart()
                eobrun = 0
            cnt += 1
            blk = grid[by, bx]
            if ah == 0:  # first scan of this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = rd.huff(actab)
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run < 15:
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += rd.bits(run)
                            break
                        k += 16  # ZRL
                    else:
                        k += run
                        if k > se:
                            raise ValueError("JPEG AC band overflow")
                        blk[k] = _extend(rd.bits(size), size) << al
                        k += 1
                continue

            # refinement scan of this band (G.1.2.3)
            def refine(kk: int) -> None:
                v = int(blk[kk])
                if rd.bits(1) and not (v & one):
                    blk[kk] = v + one if v > 0 else v - one

            k = ss
            if eobrun:
                eobrun -= 1
                while k <= se:
                    if blk[k]:
                        refine(k)
                    k += 1
                continue
            while k <= se:
                sym = rd.huff(actab)
                run, size = sym >> 4, sym & 0x0F
                val = 0
                if size == 0:
                    if run < 15:
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += rd.bits(run)
                        run = 64  # rest of the band is corrections only
                else:
                    if size != 1:
                        raise ValueError("bad JPEG AC refinement symbol")
                    val = one if rd.bits(1) else -one
                while k <= se:
                    if blk[k]:
                        refine(k)
                    else:
                        if run == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        run -= 1
                    k += 1


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline OR progressive JPEG to ``(w, h, nch, pixels)``
    (RGB or gray, top-down) — the ``png_decode`` contract."""
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
    progressive = False
    coef: dict[int, np.ndarray] = {}  # progressive accumulators
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if not comps or w == 0:
                raise ValueError("truncated JPEG")
            ns = body[0]
            scan_comps = []
            for s in range(ns):
                cid, tids = body[1 + 2 * s], body[2 + 2 * s]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tids >> 4
                        c["ac"] = tids & 0x0F
                        scan_comps.append(c)
            if not progressive:
                scan_pos = pos + 2 + seg_len
                break
            # progressive: decode this scan into the coefficient
            # accumulators, then continue the marker walk from its end
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if not coef:
                hmax = max(c["hs"] for c in comps)
                vmax = max(c["vs"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    c["bw"] = mcux * c["hs"]
                    c["bh"] = mcuy * c["vs"]
                    coef[c["id"]] = np.zeros(
                        (c["bh"], c["bw"], 64), dtype=np.int32
                    )
            rd = _BitReader(data, pos + 2 + seg_len)
            _decode_prog_scan(
                rd, scan_comps, ss, se, ahal >> 4, ahal & 0x0F,
                huff_dc, huff_ac, restart_interval,
                mcux, mcuy, w, h, hmax, vmax, coef,
            )
            pos = _skip_to_marker(data, rd.pos)
            continue
        pos += 2 + seg_len
    if progressive:
        if not coef:
            raise ValueError("truncated JPEG")
        # one vectorized dequantize + dezigzag + IDCT pass per component
        planes = {}
        for c in comps:
            zz = coef[c["id"]].astype(np.float64)
            nat = np.zeros_like(zz)
            nat[:, :, _ZIGZAG] = zz
            deq = nat.reshape(c["bh"], c["bw"], 8, 8) * qt[c["q"]]
            spat = np.einsum("ij,abjk,kl->abil", _DCT_M.T, deq, _DCT_M) + 128.0
            planes[c["id"]] = spat.transpose(0, 2, 1, 3).reshape(
                c["bh"] * 8, c["bw"] * 8
            )
        hmax = max(c["hs"] for c in comps)
        vmax = max(c["vs"] for c in comps)
        return _render_planes(planes, comps, w, h, hmax, vmax)
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
    return _render_planes(planes, comps, w, h, hmax, vmax)


def _render_planes(
    planes: dict[int, "np.ndarray"],
    comps: list[dict],
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, int, bytes]:
    """Upsample to full resolution, crop, and color-convert — shared by
    the baseline (block-at-a-time) and progressive (accumulated) paths."""
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
# 0x00=EOB/EOB1, 0xF0=ZRL, EOBn symbols (run<<4, progressive end-of-band
# runs of 2^run..2^(run+1)-1 blocks), then the run/size matrix
_AC_SYMS = [0x00, 0xF0] + [run << 4 for run in range(1, 15)] + [
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
    progressive: bool = False,
) -> bytes:
    """Baseline or progressive JPEG from top-down gray or RGB pixels
    (flat Huffman; ``restart_interval`` > 0 emits DRI + RSTn markers
    every N MCUs — baseline only; ``subsampling='420'`` box-averages
    chroma 2x2 and interleaves 16x16-pixel MCUs — the layout most web
    JPEGs use, and the encoder path that exercises the decoder's
    multi-block-per-MCU sampling logic). ``progressive=True`` emits a
    libjpeg-style scan script — interleaved DC at Al=1 + DC refinement,
    per-component spectral-selection AC bands at Al>0, then one
    successive-approximation refinement pass per bit — exercising every
    progressive decode path (EOB runs, ZRL-in-refinement, correction
    bits) without any external encoder. Lossy by nature — exists for
    decoder conformance testing and for building mixed-container
    fixture corpora."""
    if channels not in (1, 3):
        raise ValueError("jpeg_encode supports 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError("progressive encode does not emit restart markers")
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

    if progressive:
        scans = _progressive_scans(
            padded, samp, qtabs, qids, dc_enc, ac_enc,
            mcux, mcuy, width, height, hmax, vmax,
        )
        return _assemble_jpeg(
            qtabs, chans, samp, qids, dc_bits, dc_vals, ac_bits, ac_vals,
            width, height, 0, scans=scans,
        )

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
    sos = bytes((len(chans),))
    for ci in range(len(chans)):
        sos += bytes((ci + 1, 0x00))
    sos += bytes((0, 63, 0))
    return _assemble_jpeg(
        qtabs, chans, samp, qids, dc_bits, dc_vals, ac_bits, ac_vals,
        width, height, restart_interval, scans=[(sos, bytes(wtr.out))],
    )


def _assemble_jpeg(
    qtabs,
    chans,
    samp,
    qids,
    dc_bits,
    dc_vals,
    ac_bits,
    ac_vals,
    width: int,
    height: int,
    restart_interval: int,
    scans: list[tuple[bytes, bytes]],
) -> bytes:
    """Marker stream around entropy data: SOI, DQT(s), SOF (0xC0 for one
    scan, 0xC2 for a progressive scan list), DHTs, optional DRI, then
    each (SOS header, entropy bytes) pair, EOI."""
    progressive = len(scans) > 1

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
    out += seg(0xC2 if progressive else 0xC0, sof)
    out += seg(0xC4, bytes((0x00,)) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes((0x10,)) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for sos, entropy in scans:
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _progressive_scans(
    padded,
    samp,
    qtabs,
    qids,
    dc_enc,
    ac_enc,
    mcux: int,
    mcuy: int,
    width: int,
    height: int,
    hmax: int,
    vmax: int,
) -> list[tuple[bytes, bytes]]:
    """Entropy-code a progressive scan script over the padded component
    planes. Coefficients are computed ONCE (vectorized FDCT per
    component), then each scan re-walks them at its band/bit-level:

    1. DC interleaved, Al=1          4+. AC refinements, Ah=Al+1 -> Al=0
    2. per-comp AC 1..5 / 6..63 at Al (luma 2, chroma 1)
    3. DC refinement, Ah=1, Al=0

    DC scans walk the interleaved MCU grid; AC scans walk each
    component's OWN ceil-grid (T.81 A.2.2 — smaller than the padded MCU
    grid when subsampled), matching the decoder exactly."""
    ncomp = len(padded)
    zzb = []
    for ci, ch in enumerate(padded):
        nby, nbx = ch.shape[0] // 8, ch.shape[1] // 8
        blocks = ch.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        coeff = np.einsum("ij,abjk,kl->abil", _DCT_M, blocks, _DCT_M.T)
        qz = np.round(coeff / qtabs[qids[ci]]).astype(np.int64)
        zzb.append(qz.reshape(nby, nbx, 64)[:, :, _ZIGZAG])

    def sos_body(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        b = bytes((len(comp_ids),))
        for ci in comp_ids:
            b += bytes((ci + 1, 0x00))
        return b + bytes((ss, se, (ah << 4) | al))

    def comp_grid(ci: int) -> tuple[int, int]:
        hs, vs = samp[ci]
        cw = -(-(width * hs) // hmax)
        ch = -(-(height * vs) // vmax)
        return -(-cw // 8), -(-ch // 8)

    scans: list[tuple[bytes, bytes]] = []

    # ---- scan 1: DC first pass (interleaved, Al=1) ----------------------
    wtr = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(zzb[ci][my * vs + by, mx * hs + bx, 0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size = _size_of(diff)
                        ln, code = dc_enc[size]
                        wtr.bits(code, ln)
                        if size:
                            wtr.bits(
                                diff if diff >= 0 else diff + (1 << size) - 1,
                                size,
                            )
    wtr.flush()
    scans.append((sos_body(list(range(ncomp)), 0, 0, 0, 1), bytes(wtr.out)))

    # ---- AC first passes (spectral selection, Al per component) ---------
    ac_al = [2] + [1] * (ncomp - 1)  # libjpeg-style: luma coarser first

    def ac_first(ci: int, ss: int, se: int, al: int) -> tuple[bytes, bytes]:
        wtr = _BitWriter()
        nbx, nby = comp_grid(ci)
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ln, code = ac_enc[r << 4]
                wtr.bits(code, ln)
                if r:
                    wtr.bits(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(nby):
            for bx in range(nbx):
                zz = zzb[ci][by, bx]
                vals = []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = abs(v) >> al
                    vals.append(t if v >= 0 else -t)
                last = -1
                for i, t in enumerate(vals):
                    if t:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for i in range(last + 1):
                    t = vals[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        ln, code = ac_enc[0xF0]
                        wtr.bits(code, ln)
                        r -= 16
                    size = _size_of(t)
                    ln, code = ac_enc[(r << 4) | size]
                    wtr.bits(code, ln)
                    wtr.bits(t if t >= 0 else t + (1 << size) - 1, size)
                    r = 0
                if last < se - ss:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
        flush_eob()
        wtr.flush()
        return sos_body([ci], ss, se, 0, al), bytes(wtr.out)

    # luma split into two bands to exercise multi-band selection
    scans.append(ac_first(0, 1, 5, ac_al[0]))
    scans.append(ac_first(0, 6, 63, ac_al[0]))
    for ci in range(1, ncomp):
        scans.append(ac_first(ci, 1, 63, ac_al[ci]))

    # ---- DC refinement (interleaved, Ah=1 -> Al=0) -----------------------
    wtr = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        wtr.bits(
                            int(zzb[ci][my * vs + by, mx * hs + bx, 0]) & 1, 1
                        )
    wtr.flush()
    scans.append((sos_body(list(range(ncomp)), 0, 0, 1, 0), bytes(wtr.out)))

    # ---- AC refinements (Ah=Al+1 -> Al, down to 0) -----------------------
    def ac_refine(ci: int, ss: int, se: int, al: int) -> tuple[bytes, bytes]:
        wtr = _BitWriter()
        nbx, nby = comp_grid(ci)
        for by in range(nby):
            for bx in range(nbx):
                zz = zzb[ci][by, bx]
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob = 0
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i + 1
                r = 0
                buf: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i < eob:
                        ln, code = ac_enc[0xF0]
                        wtr.bits(code, ln)
                        r -= 16
                        for b in buf:
                            wtr.bits(b, 1)
                        buf = []
                    if t > 1:
                        buf.append(t & 1)
                        continue
                    ln, code = ac_enc[(r << 4) | 1]
                    wtr.bits(code, ln)
                    wtr.bits(1 if int(zz[ss + i]) > 0 else 0, 1)
                    for b in buf:
                        wtr.bits(b, 1)
                    buf = []
                    r = 0
                if r > 0 or buf:
                    ln, code = ac_enc[0x00]
                    wtr.bits(code, ln)
                    for b in buf:
                        wtr.bits(b, 1)
        wtr.flush()
        return sos_body([ci], ss, se, al + 1, al), bytes(wtr.out)

    for al in range(ac_al[0] - 1, -1, -1):
        scans.append(ac_refine(0, 1, 5, al))
        scans.append(ac_refine(0, 6, 63, al))
    for ci in range(1, ncomp):
        for al in range(ac_al[ci] - 1, -1, -1):
            scans.append(ac_refine(ci, 1, 63, al))
    return scans
