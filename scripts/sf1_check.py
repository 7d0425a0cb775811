#!/usr/bin/env python
"""Value-checked correctness at sf1 (VERDICT r04 #4).

The driver's oracle gate runs at sf0.01; bench timings run at sf0.1/sf1.
This closes the gap: run the registered queries AND their DuckDB oracles
directly on the scaled sf1 corpus (scripts/make_sfx.py output — replica-
shifted keys keep every query's semantics intact) and compare row count +
schema + canonicalized values, exactly like the driver and the local
oracle-parity gate do. Called from bench.py's sf1 rehearsal; the per-query
verdicts land in BENCH_r{N}'s ``sf1.correctness`` block.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_optimizations_spark import TABLES  # noqa: E402


def _canon(v):
    """Driver-style canonical value (mirrors tests/conftest.py::_canon)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return repr(v)


def _duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        target = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{target}/*.parquet" if os.path.isdir(target) else target
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def compare_one(spark_df, con, sql: str) -> dict:
    """{rows_match, schema_match, values_match, spark_rows, oracle_rows}."""
    out = {
        "rows_match": False,
        "schema_match": False,
        "values_match": False,
        "spark_rows": None,
        "oracle_rows": None,
    }
    spark_cols = sorted(spark_df.columns)
    spark_rows = spark_df.collect()
    rel = con.execute(sql)
    duck_cols_raw = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    out["spark_rows"] = len(spark_rows)
    out["oracle_rows"] = len(duck_rows)
    out["rows_match"] = len(spark_rows) == len(duck_rows)
    out["schema_match"] = spark_cols == sorted(duck_cols_raw)
    if not (out["rows_match"] and out["schema_match"]):
        return out
    s_idx = [spark_df.columns.index(c) for c in spark_cols]
    d_idx = [duck_cols_raw.index(c) for c in sorted(duck_cols_raw)]
    s_canon = sorted(tuple(_canon(r[i]) for i in s_idx) for r in spark_rows)
    d_canon = sorted(tuple(_canon(r[i]) for i in d_idx) for r in duck_rows)
    out["values_match"] = s_canon == d_canon
    return out


def run_sf1_correctness(spark, sf_dir: str, names: list[str]) -> dict:
    """Run each named registered query and its oracle on ``sf_dir``; skip
    names without an oracle (rows-only). Returns {name: verdict-dict}."""
    from delta_lake_optimizations_spark.registry import registry

    reg = registry()
    con = _duck_connect(sf_dir)
    out: dict = {}
    try:
        for name in names:
            q = reg[name]
            if q.oracle is None:
                continue
            try:
                out[name] = compare_one(q.fn(spark, sf_dir), con, q.oracle)
            except Exception as exc:  # noqa: BLE001 — recorded, not raised
                out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    finally:
        con.close()
    return out


def main() -> None:
    import argparse
    import json

    from delta_lake_optimizations_spark import get_spark
    from delta_lake_optimizations_spark.registry import registry

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sfx/sf1")
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()
    spark = get_spark(app_name="sf1_check")
    names = args.names or [n for n, q in registry().items() if q.headline]
    print(json.dumps(run_sf1_correctness(spark, args.sf_dir, names), indent=1))


if __name__ == "__main__":
    main()
