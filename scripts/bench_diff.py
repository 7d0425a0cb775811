"""Mechanical bench-regression diff between two bench JSON records.

Accepts either the compact one-line record (``BENCH_r{N}.json`` /
bench.py stdout) or the full ledger (``bench_detail.json``). Prints a
per-query table of old vs new medians with percent deltas, flags entries
past ``--threshold`` (default 20%), and exits nonzero when any flagged
regression exists — so a round can gate on it.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--threshold 0.2]
"""

from __future__ import annotations

import argparse
import json
import sys


def _queries(doc: dict) -> dict[str, float]:
    # driver wrapper: {"n":…, "rc":…, "tail": "...", "parsed": {...}}
    if isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    elif "queries" not in doc and isinstance(doc.get("tail"), str):
        # unparsed wrapper — salvage the queries map from the tail text
        import re

        m = re.search(r'"queries"\s*:\s*(\{[^{}]*\})', doc["tail"])
        if m:
            doc = {"queries": json.loads(m.group(1))}
    if "queries" in doc and isinstance(doc["queries"], dict):
        return {k: float(v) for k, v in doc["queries"].items()}
    raise SystemExit("no 'queries' map in bench record")


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

    old_doc, new_doc = _load(args.old), _load(args.new)
    old, new = _queries(old_doc), _queries(new_doc)
    # Host-speed normalization: both records carry a fixed engine-free
    # calibration scan; dividing the new medians by the host-speed ratio
    # separates code regressions from shared-VM slowdown.
    ratio = 1.0
    oc = (old_doc.get("parsed") or old_doc).get("calibration_scan_sec")
    nc = (new_doc.get("parsed") or new_doc).get("calibration_scan_sec")
    if oc and nc:
        ratio = float(nc) / float(oc)
        print(f"calibration: old={oc}s new={nc}s host-speed ratio={ratio:.3f} "
              f"(new medians divided by this)")
        new = {k: v / ratio for k, v in new.items()}
    names = sorted(set(old) | set(new))
    flagged = []
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for n in names:
        o, v = old.get(n), new.get(n)
        if o is None or v is None:
            print(f"{n:42s} {o or '-':>8} {v or '-':>8} {'NEW' if o is None else 'GONE':>8}")
            continue
        delta = (v - o) / o if o else 0.0
        mark = " <-- REGRESSION" if delta > args.threshold else ""
        if mark:
            flagged.append(n)
        print(f"{n:42s} {o:8.3f} {v:8.3f} {delta:+7.1%}{mark}")
    ot, nt = sum(old.values()), sum(new.values())
    print(f"{'TOTAL':42s} {ot:8.3f} {nt:8.3f} {(nt - ot) / ot:+7.1%}")
    if flagged:
        print(f"\n{len(flagged)} regression(s) past {args.threshold:.0%}: {flagged}")
        sys.exit(1)


if __name__ == "__main__":
    main()
