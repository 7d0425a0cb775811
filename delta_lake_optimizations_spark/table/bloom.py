"""Per-file Bloom-filter sidecars for equality-predicate file skipping.

The min/max footer stats (``collect_file_stats``) prune range predicates
well only when the layout clusters the predicate column (partitioning,
Z-order). For a point lookup on a high-cardinality UNclustered column —
``l_partkey = 12345`` over files whose partkey range spans the whole
domain — min/max prunes nothing. A small per-file Bloom filter answers
"definitely not in this file" for arbitrary layouts, the same idea as
Delta/Iceberg Bloom-filter indexes (reference teaches only min/max
skipping, docs/02-lab-optimizations.md:591-597; this extends it).
Parquet has native column blooms, but pyarrow's writer cannot emit them
and footer blooms still require opening every file — a log-side sidecar
lets the DRIVER prune the file list before Spark ever sees it.

Scale design (100 TB):

- the build is ONE distributed aggregation: rows → (file, bit-position)
  pairs via k CRC32-derived double hashes, map-side-combined
  ``collect_set`` (bounded by m positions per file), one shuffle keyed
  by file path. The driver receives ≤ m integers per file — never data.
- the hash (CRC32 + Kirsch-Mitzenmacher double hashing) is evaluated
  JVM-side at build time (``F.crc32`` inside whole-stage codegen) and
  reproduced bit-exactly in Python at probe time (``zlib.crc32`` —
  verified identical), so probing costs zero Spark jobs.
- sidecars live under ``_log/_bloom/`` keyed by (column, version).
  Data files are immutable, so entries never go stale; a file without
  an entry (written after the last build) is conservatively scanned.
  ``bloom_build`` indexes only files missing entries, so periodic
  builds are incremental.
"""

from __future__ import annotations

import base64
import json
import math
import os
import zlib
from typing import Any

from pyspark.sql import functions as F

_BLOOM_DIR = "_bloom"
#: table property: comma-separated columns to auto-index at write time
BLOOM_COLUMNS_PROP = "graft.bloom.columns"
_MAX_BITS = 1 << 22  # 4 Mbit = 512 KiB/file/column cap, keeps sidecars bounded


def _params_for(n_rows: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_rows`` keys at false-positive rate ``fpp``;
    m rounded to a power of two so ``% m`` is well distributed and cheap."""
    n = max(n_rows, 1)
    bits = int(-n * math.log(fpp) / (math.log(2) ** 2)) + 1
    m = 1 << max(bits - 1, 1).bit_length()
    m = min(m, _MAX_BITS)
    k = max(1, min(8, round(m / n * math.log(2))))
    return m, k


def _norm_col(col: str):
    """Build-side normalization: everything hashes as its UTF-8 string form."""
    return F.col(col).cast("string")


#: Column types whose Python string form provably matches Spark's
#: CAST(col AS STRING) byte-for-byte (so probe and build hashes agree).
#: Doubles/floats/decimals/timestamps are EXCLUDED: Spark prints '1.0E-7'
#: where Python prints '1e-07', so a probe would produce Bloom false
#: NEGATIVES — silently dropping files that DO contain matches. For those
#: types the index is refused at build and the probe never prunes.
_SUPPORTED_DTYPES = frozenset(
    {"string", "tinyint", "smallint", "int", "bigint", "boolean", "date"}
)


def _probe_string(value: Any, dtype: str | None) -> str | None:
    """Probe-side string for ``value`` against a column of ``dtype``,
    matching Spark's CAST(col AS STRING) formatting exactly — or ``None``
    when equivalence can't be guaranteed (the caller must then scan).

    The coercion mirrors how Spark would compare the probe literal to the
    column (e.g. an integral-valued float probe against a bigint column
    equals the integer; a fractional probe can't be made safe, so no
    pruning)."""
    import datetime

    if dtype is not None and dtype not in _SUPPORTED_DTYPES:
        return None
    if isinstance(value, bool):
        return ("true" if value else "false") if dtype in (None, "boolean") else None
    if isinstance(value, int):
        if dtype in (None, "tinyint", "smallint", "int", "bigint"):
            return str(value)
        if dtype == "string":
            return str(value)
        return None
    if isinstance(value, float):
        # integral-valued float probe vs an integral column: 123.0 == 123
        if dtype in ("tinyint", "smallint", "int", "bigint") and value.is_integer():
            return str(int(value))
        return None
    if isinstance(value, str):
        return value if dtype in (None, "string") else None
    if isinstance(value, datetime.date) and not isinstance(value, datetime.datetime):
        # Python date.isoformat() == Spark CAST(date AS STRING) (yyyy-MM-dd)
        return value.isoformat() if dtype in (None, "date") else None
    return None


def _probe_positions(s: str, m: int, k: int) -> list[int]:
    """Probe-side twin of the build-side hash (must match bit-exactly):
    h1 = crc32(s), h2 = crc32(reverse(s)), pos_i = h1 + i*(2*h2+1).
    The odd step makes the double-hash cycle cover all of m (m is 2^j)."""
    h1 = zlib.crc32(s.encode("utf-8"))
    h2 = zlib.crc32(s[::-1].encode("utf-8"))
    step = 2 * h2 + 1
    return [(h1 + i * step) % m for i in range(k)]


def _bloom_dir(table) -> str:
    return os.path.join(table._log_path, _BLOOM_DIR)


def _sidecar_paths(table, column: str) -> list[str]:
    d = _bloom_dir(table)
    if not os.path.isdir(d):
        return []
    out = [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.startswith(f"{column}.") and f.endswith(".json")
    ]
    return sorted(out, reverse=True)  # newest first


def indexed_files(table, column: str) -> set[str]:
    """Relative paths of data files that already have a bloom entry."""
    seen: set[str] = set()
    for p in _sidecar_paths(table, column):
        with open(p) as fh:
            seen.update(json.load(fh)["files"].keys())
    return seen


#: Cap on files whose bit positions are collect()ed at once. At the 4-Mbit
#: cap each file's position set is ~32 MB of Python ints in the worst case;
#: an unbatched build over hundreds of files could spike driver memory.
_BUILD_COLLECT_BATCH = 32


def bloom_build(table, columns: list[str], fpp: float = 0.01) -> dict[str, int]:
    """Build/refresh Bloom sidecars for ``columns`` over the current
    snapshot. Incremental: files that already have an entry are skipped.
    Returns ``{column: files_indexed}``.

    Sidecars are built from the RAW file contents (no deletion-vector
    filtering): DV-deleted rows become extra set bits, which is harmlessly
    conservative AND keeps the index correct for time-travel reads at
    versions where those rows were still live.

    Refuses non-string/integral/boolean/date columns: float/decimal/
    timestamp string forms differ between Spark's CAST and Python's str(),
    which would make probes produce false negatives (missing rows)."""
    snap = table.snapshot()
    results: dict[str, int] = {}
    for column in columns:
        schema = snap.schema
        if schema is None:
            raise ValueError("bloom_build: table has no schema (empty table)")
        dtype = {f.name: f.dataType.simpleString() for f in schema.fields}.get(column)
        if dtype is None:
            raise ValueError(f"bloom_build: column {column!r} not in table schema")
        if dtype not in _SUPPORTED_DTYPES:
            raise ValueError(
                f"bloom_build: column {column!r} has type {dtype}; Bloom "
                f"sidecars support only {sorted(_SUPPORTED_DTYPES)} (other "
                "types have Spark-vs-Python string forms that diverge and "
                "would produce false-negative pruning)"
            )
        have = indexed_files(table, column)
        todo = [f for f in snap.files if f.path not in have]
        if not todo:
            results[column] = 0
            continue
        m, k = _params_for(max(f.num_records for f in todo), fpp)
        entries: dict[str, str] = {}
        # Batch the per-file position collects so driver memory stays
        # bounded regardless of how many files one build covers.
        for start in range(0, len(todo), _BUILD_COLLECT_BATCH):
            batch = todo[start : start + _BUILD_COLLECT_BATCH]
            df = table._read_files(snap, batch, with_provenance=True, apply_dvs=False)
            s = _norm_col(column)
            h1 = F.crc32(s.cast("binary"))
            h2 = F.crc32(F.reverse(s).cast("binary"))
            step = h2 * F.lit(2) + F.lit(1)
            positions = F.array(*[(h1 + F.lit(i) * step) % F.lit(m) for i in range(k)])
            rel = table._rel_path_expr(F.col("__prov_file"))
            agg = (
                df.where(F.col(column).isNotNull())
                .select(rel.alias("__f"), F.explode(positions).alias("__p"))
                .groupBy("__f")
                .agg(F.collect_set("__p").alias("__ps"))
            )
            for row in agg.collect():  # ≤ m ints per file — metadata, not data
                bits = bytearray((m + 7) // 8)
                for p in row["__ps"]:
                    bits[p >> 3] |= 1 << (p & 7)
                entries[row["__f"]] = base64.b64encode(bytes(bits)).decode("ascii")
        # files whose column is entirely NULL produce no row: store an
        # empty filter so equality probes (NULL never equals) skip them
        for f in todo:
            entries.setdefault(f.path, "")
        os.makedirs(_bloom_dir(table), exist_ok=True)
        out = os.path.join(
            _bloom_dir(table), f"{column}.{snap.version:011d}.json"
        )
        tmp = out + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"column": column, "dtype": dtype, "m": m, "k": k, "fpp": fpp, "files": entries},
                fh,
            )
        os.replace(tmp, out)
        results[column] = len(todo)
    return results


class _BloomIndex:
    """All sidecars for one column, newest-first; probe answers
    may-contain per relative file path (True when the file has no entry)."""

    def __init__(self, sidecars: list[dict[str, Any]]):
        self._sidecars = sidecars

    def may_contain(self, rel_path: str, value: Any) -> bool:
        for sc in self._sidecars:
            b64 = sc["files"].get(rel_path)
            if b64 is None:
                continue
            if b64 == "":  # all-NULL file: no value can match equality
                return False
            # dtype-aware probe normalization; None means string-form
            # equivalence with the build-side hash can't be guaranteed
            # (e.g. float probe, legacy sidecar without dtype + odd type)
            # — conservatively scan rather than risk a false negative.
            s = _probe_string(value, sc.get("dtype"))
            if s is None:
                return True
            bits = base64.b64decode(b64)
            return all(
                bits[p >> 3] & (1 << (p & 7))
                for p in _probe_positions(s, sc["m"], sc["k"])
            )
        return True  # unindexed file — must scan


def load_bloom_index(table, column: str) -> _BloomIndex | None:
    paths = _sidecar_paths(table, column)
    if not paths:
        return None
    sidecars = []
    for p in paths:
        with open(p) as fh:
            sidecars.append(json.load(fh))
    return _BloomIndex(sidecars)


def bloom_prune(table, files: list, preds: list[tuple[str, str, Any]]) -> list:
    """Drop files whose Bloom filter proves an ``=`` (or every value of an
    ``in``-list) predicate can't match. Conservative everywhere else:
    non-equality ops, missing sidecars, and unindexed files all pass
    through."""
    for col, op, value in preds:
        if op not in ("=", "in"):
            continue
        idx = load_bloom_index(table, col)
        if idx is None:
            continue
        if op == "=":
            files = [f for f in files if idx.may_contain(f.path, value)]
        else:
            files = [
                f for f in files
                if any(idx.may_contain(f.path, v) for v in value)
            ]
    return files
