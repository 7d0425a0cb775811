"""sf10 TPC-H spot check (VERDICT r08 watch item: q5 at sf10).

Builds a factor-100 TPC-H corpus from the sf0.1 base (~60M lineitem
rows; text/vector tables at 1x — the relational engine is what scales
here), times q1/q3/q5/q9/q21 at sf5_tpch AND sf10_tpch in-session
(machine drift cancels in the ratio; bar: <= ~3x for 2x data, i.e.
1.5x-linear — the sf5 gate's own bar scaled), and VALUE-checks every
query against DuckDB on the sf10 corpus.

Run standalone (not part of the per-round bench — doubling the driver's
bench wall-clock for a watch item would be a bad trade):

    python scripts/sf10_tpch_check.py

Results are recorded in SURVEY.md §8.0.5 and the bench ledger commit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TPCH = (
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_revenue_by_nation",
    "q9_product_type_profit",
    "q21_suppliers_kept_orders_waiting",
)


def main() -> int:
    from make_sfx import make_sfx
    from sf1_check import run_sf1_correctness

    from delta_lake_optimizations_spark import get_spark
    from delta_lake_optimizations_spark.registry import registry

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sf10-tpch-check")
    overrides = {t: 1 for t in ("documents", "embeddings", "events")}
    sf5_dir = make_sfx(
        spark, src, "/tmp/spark_graft_sfx/sf5_tpch", factor=50,
        factor_overrides=overrides,
    )
    sf10_dir = make_sfx(
        spark, src, "/tmp/spark_graft_sfx/sf10_tpch", factor=100,
        factor_overrides=overrides,
    )
    reg = registry()
    out: dict = {"factor_vs_sf5": 2, "queries": {}, "ratio_vs_sf5": {}}
    for name in TPCH:
        fn = reg[name].fn
        fn(spark, sf5_dir).count()  # warm (JIT, file listing)
        t0 = time.perf_counter()
        fn(spark, sf5_dir).count()
        t5 = round(time.perf_counter() - t0, 4)
        fn(spark, sf10_dir).count()
        t0 = time.perf_counter()
        fn(spark, sf10_dir).count()
        t10 = round(time.perf_counter() - t0, 4)
        out["queries"][name] = {"sf5_sec": t5, "sf10_sec": t10}
        out["ratio_vs_sf5"][name] = round(t10 / t5, 2)
        print(f"{name:40s} sf5 {t5:8.3f}s  sf10 {t10:8.3f}s  "
              f"ratio {t10 / t5:5.2f}", flush=True)
    out["max_ratio_vs_sf5"] = max(out["ratio_vs_sf5"].values())
    print("value-checking vs DuckDB at sf10 ...", flush=True)
    out["correctness"] = run_sf1_correctness(spark, sf10_dir, list(TPCH))
    out["correctness_all_green"] = all(
        v.get("rows_match") and v.get("schema_match") and v.get("values_match")
        for v in out["correctness"].values()
    ) and len(out["correctness"]) == len(TPCH)
    print(json.dumps(out, indent=1))
    ok = out["correctness_all_green"] and out["max_ratio_vs_sf5"] <= 3.0
    print("RESULT:", "PASS" if ok else "CHECK", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
