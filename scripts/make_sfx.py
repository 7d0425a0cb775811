#!/usr/bin/env python
"""Scale-up corpus generator for the sf1 rehearsal (VERDICT r03 #7).

The driver ships sf0.001/0.01/0.1 only; correctness runs at <= 0.1. This
replicates an existing sf directory K times (default 10: sf0.1 -> "sf1")
with per-replica key shifts so every join key stays referentially intact
WITHIN its replica — query semantics are unchanged, data volume is Kx.
Dimension tables keyed by nationkey/regionkey are copied once (facts
reference them unshifted, exactly like TPC-H scale-up). Output goes under
/tmp (never into the read-only testdata mount) and is content-keyed so
repeat benches reuse it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

# table -> columns to shift per replica (replica r adds r * SHIFT)
SHIFT = 1_000_000_000
SHIFTED: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    # nation / region: single copy, facts reference them unshifted
    "nation": (),
    "region": (),
}


def _source_manifest(src_dir: str, factor: int) -> str:
    """Identity of a scaled corpus: the factor plus a fingerprint (sizes +
    mtimes) of every source parquet. A rerun with a different factor or a
    regenerated source must NOT reuse the stale output."""
    parts = [f"factor={factor}"]
    for table in sorted(SHIFTED):
        target = os.path.join(os.path.abspath(src_dir), f"{table}.parquet")
        if os.path.isdir(target):
            for dirpath, _dn, filenames in os.walk(target):
                for fn in sorted(filenames):
                    st = os.stat(os.path.join(dirpath, fn))
                    parts.append(f"{table}/{fn}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.exists(target):
            st = os.stat(target)
            parts.append(f"{table}:{st.st_size}:{st.st_mtime_ns}")
    return "\n".join(parts)


def make_sfx(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    factor: int = 10,
    factor_overrides: dict[str, int] | None = None,
) -> str:
    """Write the scaled corpus; returns ``out_dir``. A manifest records
    the source fingerprint + factors; per-table writes are skipped only
    while the manifest matches — a changed source or factor regenerates
    everything.

    ``factor_overrides`` scales individual tables differently (e.g. the
    sf5 text/vector rehearsal replicates documents/embeddings 50x while
    carrying the TPC-H facts at 1x — the operators under rehearsal never
    read them, but the oracle harness registers a view per table)."""
    from delta_lake_optimizations_spark.catalog import load_table

    overrides = factor_overrides or {}
    os.makedirs(out_dir, exist_ok=True)
    manifest = _source_manifest(src_dir, factor) + "\n" + repr(
        sorted(overrides.items())
    )
    manifest_path = os.path.join(out_dir, "_MANIFEST")
    stale = not (
        os.path.exists(manifest_path) and open(manifest_path).read() == manifest
    )
    for table, shift_cols in SHIFTED.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if not stale and os.path.exists(os.path.join(dst, "_SUCCESS")):
            continue
        df = load_table(spark, src_dir, table)
        table_factor = overrides.get(table, factor)
        if shift_cols and table_factor > 1:
            reps = df.crossJoin(
                F.broadcast(
                    spark.range(table_factor).select(F.col("id").alias("__rep"))
                )
            )
            for c in shift_cols:
                reps = reps.withColumn(
                    c, F.col(c) + F.col("__rep") * F.lit(SHIFT)
                )
            df = reps.drop("__rep")
        df.write.mode("overwrite").parquet(dst)
    with open(manifest_path, "w") as f:
        f.write(manifest)
    return out_dir


def main() -> None:
    import argparse

    from delta_lake_optimizations_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sfx/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="make_sfx")
    make_sfx(spark, args.src, args.out, args.factor)
    print(args.out)


if __name__ == "__main__":
    main()
