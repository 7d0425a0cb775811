"""REAL media metadata probing from binary payloads — stdlib only.

The pixel/sample *decode* step still needs a codec library (see
``multimodal.decode_assets``'s declared stub), but container HEADERS are
plain structs: PNG IHDR, JPEG SOF markers, GIF/BMP fixed fields, WAV
RIFF fmt — all parseable with ``struct`` in a few bytes. That covers the
metadata a curation pipeline actually filters on (dimensions, sample
rate, channel count, duration) without decoding a single pixel.

Scale: probing reads only the payload's first KBs; executed as an
Arrow-batched ``mapInPandas`` so at 100 TB the probe rides the normal
scan (and in a URI+byte-range layout, a ranged GET of the header —
never the full asset).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

PROBE_SCHEMA = (
    "doc_id bigint, detected string, width int, height int, "
    "channels int, sample_rate int, duration_ms bigint, n_bytes bigint"
)

_JPEG_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def probe_media(payload: bytes | None) -> dict[str, Any]:
    """Parse container headers: detected mime + dimensions/audio facts.
    Unknown or truncated payloads come back ``detected='unknown'`` with
    nulls — probing never throws on garbage input."""
    out: dict[str, Any] = {
        "detected": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    if not payload:
        return out
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            out.update(detected="image/png", width=w, height=h)
        elif b[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOF segment
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    i += 2  # standalone markers have no length field
                    continue
                if i + 4 > len(b):
                    break
                seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if marker in _JPEG_SOF_MARKERS and i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    out.update(detected="image/jpeg", width=w, height=h)
                    break
                i += 2 + seg_len
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            out.update(detected="image/gif", width=w, height=h)
        elif b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            out.update(detected="image/bmp", width=w, height=abs(h))
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # walk RIFF chunks for fmt (audio facts) and data (duration)
            i = 12
            fmt: tuple[int, int, int] | None = None
            data_size: int | None = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                size = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
                    block_align = struct.unpack("<H", b[i + 20 : i + 22])[0]
                    fmt = (channels, rate, block_align)
                elif cid == b"data":
                    data_size = size
                i += 8 + size + (size & 1)  # chunks are word-aligned
            if fmt:
                channels, rate, block_align = fmt
                out.update(
                    detected="audio/wav", channels=channels, sample_rate=rate
                )
                if data_size is not None and rate and block_align:
                    out["duration_ms"] = int(
                        data_size / block_align / rate * 1000
                    )
    except (struct.error, IndexError):
        pass  # truncated header — keep whatever was parsed before the cut
    return out


def probe_assets(assets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched header probe over a multimodal frame
    (``id_col`` + ``payload`` binary)."""

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                r = probe_media(None if p is None else bytes(p))
                r[id_col] = doc_id
                r["n_bytes"] = 0 if p is None else len(p)
                rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "detected", "width", "height",
                    "channels", "sample_rate", "duration_ms", "n_bytes",
                ],
            )

    return assets.mapInPandas(probe_batches, schema=PROBE_SCHEMA)
