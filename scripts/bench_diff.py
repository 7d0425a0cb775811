"""Mechanical bench-regression diff between two bench JSON records.

Accepts either the compact one-line record (``BENCH_r{N}.json`` /
bench.py stdout) or the full ledger (``bench_detail.json``). Prints a
per-query table of old vs new medians with RAW and HOST-NORMALIZED
percent deltas, flags entries whose NORMALIZED delta passes
``--threshold`` (default 20%), and exits nonzero when any flagged
regression exists — so a round can gate on it.

Normalization (VERDICT r10 "what's wrong" #1): every bench run times an
engine-independent calibration pair (raw parquet scan + a shuffling
aggregate). The r10 raw headline read as a 63% regression until manually
adjudicated against a 1.77x calibration drift on a contended machine;
this script makes that adjudication mechanical. When both records carry
per-query ``calibration_relative`` ratios (bench_detail.json,
round >= 11) those compare directly; otherwise the new medians divide by
the host-speed ratio (scan+shuffle calibrator sum). Raw deltas are
printed beside — they never gate.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--threshold 0.2]
"""

from __future__ import annotations

import argparse
import json
import sys


def _unwrap(doc: dict) -> dict:
    # driver wrapper: {"n":…, "rc":…, "tail": "...", "parsed": {...}}
    if isinstance(doc.get("parsed"), dict):
        return doc["parsed"]
    if "queries" not in doc and isinstance(doc.get("tail"), str):
        # unparsed wrapper — salvage the queries map from the tail text
        import re

        m = re.search(r'"queries"\s*:\s*(\{[^{}]*\})', doc["tail"])
        if m:
            return {"queries": json.loads(m.group(1))}
    return doc


def _queries(doc: dict) -> dict[str, float]:
    if "queries" in doc and isinstance(doc["queries"], dict):
        return {k: float(v) for k, v in doc["queries"].items()}
    raise SystemExit("no 'queries' map in bench record")


def _cal_relative(doc: dict) -> dict[str, float] | None:
    """Per-query host-normalized ratios, when the record carries them."""
    qd = doc.get("queries_detail")
    if isinstance(qd, dict) and all(
        isinstance(v, dict) and "calibration_relative" in v
        for v in qd.values()
    ) and qd:
        return {k: float(v["calibration_relative"]) for k, v in qd.items()}
    return None


def _host_speed(doc: dict) -> float | None:
    scan = doc.get("calibration_scan_sec")
    shuf = doc.get("calibration_shuffle_sec")
    if scan and shuf:
        return float(scan) + float(shuf)
    return float(scan) if scan else None


def _load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    # driver records sometimes wrap the line: take the last JSON object
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        raise


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()

    old_doc = _unwrap(_load(args.old))
    new_doc = _unwrap(_load(args.new))
    old, new = _queries(old_doc), _queries(new_doc)

    old_rel, new_rel = _cal_relative(old_doc), _cal_relative(new_doc)
    if old_rel is not None and new_rel is not None:
        print("normalized deltas from per-query calibration_relative ratios")
    else:
        oc, nc = _host_speed(old_doc), _host_speed(new_doc)
        ratio = (nc / oc) if (oc and nc) else 1.0
        if oc and nc:
            print(
                f"calibration: old={oc:.4f}s new={nc:.4f}s host-speed "
                f"ratio={ratio:.3f} (normalized = raw new / this)"
            )
        else:
            print("no calibration fields — normalized == raw")
        old_rel = dict(old)
        new_rel = {k: v / ratio for k, v in new.items()}

    names = sorted(set(old) | set(new))
    flagged = []
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'raw':>8s} {'norm':>8s}")
    for n in names:
        o, v = old.get(n), new.get(n)
        if o is None or v is None:
            print(f"{n:42s} {o or '-':>8} {v or '-':>8} "
                  f"{'NEW' if o is None else 'GONE':>8}")
            continue
        raw_delta = (v - o) / o if o else 0.0
        orl, nrl = old_rel.get(n), new_rel.get(n)
        norm_delta = (nrl - orl) / orl if (orl and nrl is not None) else raw_delta
        mark = " <-- REGRESSION" if norm_delta > args.threshold else ""
        if mark:
            flagged.append(n)
        print(f"{n:42s} {o:8.3f} {v:8.3f} {raw_delta:+7.1%} "
              f"{norm_delta:+7.1%}{mark}")
    ot, nt = sum(old.values()), sum(new.values())
    ort, nrt = sum(old_rel.values()), sum(new_rel.values())
    print(f"{'TOTAL':42s} {ot:8.3f} {nt:8.3f} {(nt - ot) / ot:+7.1%} "
          f"{(nrt - ort) / ort:+7.1%}")
    if flagged:
        print(f"\n{len(flagged)} NORMALIZED regression(s) past "
              f"{args.threshold:.0%}: {flagged}")
        sys.exit(1)


if __name__ == "__main__":
    main()
