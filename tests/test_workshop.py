"""Workshop-flow tests: the reference lab's relative claims (SURVEY §6) as
assertions — OPTIMIZE cuts file count without changing data, Z-order+stats
prune files for the flagship predicate, cached recount is faster, the
history sequence matches the narrative, and explicit-schema CSV reads skip
the inference scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

from delta_lake_optimizations_spark.workshop import (
    SALES_SCHEMA,
    csv_read_explicit,
    csv_read_inferred,
    generate_sales,
    run_workshop,
)


def test_generate_sales_schema_and_domains(spark):
    df = generate_sales(spark, n_rows=5_000, n_parts=4)
    # nullability differs (generated columns are provably non-null)
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in SALES_SCHEMA.fields
    ]
    assert df.count() == 5_000
    doms = df.selectExpr(
        "min(price) AS pmin", "max(quantity) AS qmax",
        "count(distinct country) AS nc", "count(distinct category) AS ncat",
    ).collect()[0]
    assert doms["pmin"] >= 1.0 and doms["qmax"] <= 10
    assert doms["nc"] == 10 and doms["ncat"] == 6
    # total == price * quantity (reference :63)
    bad = df.filter("abs(total - round(price * quantity, 2)) > 0.011").count()
    assert bad == 0


def test_run_workshop_narrative(spark, tmp_path):
    r = run_workshop(spark, str(tmp_path), n_rows=40_000, n_small_files=32)
    # OPTIMIZE merges many small files into fewer larger ones (README.md:35)
    assert r["filesAfterOptimize"] < r["filesBefore"]
    # data identical across OPTIMIZE
    assert r["flagshipCountAfterOptimize"] == r["flagshipCount"]
    # z-order + per-file stats prune files for the flagship predicate (§5.3)
    assert r["filesScannedFlagship"] < r["filesAfterOptimize"]
    # delete/time-travel/restore narrative (:220-287)
    assert r["countAfterDelete"] < r["countTimeTravel"]
    assert r["countAfterRestore"] == r["countTimeTravel"]
    # vacuum dry run found the pre-OPTIMIZE files (M4)
    assert r["vacuumDryRunFiles"] > 0
    assert r["history"][0] == "RESTORE"
    assert "OPTIMIZE" in r["history"]


def test_csv_explicit_schema_skips_inference(spark, tmp_path):
    df = generate_sales(spark, n_rows=2_000, n_parts=2)
    csv_dir = str(tmp_path / "sales_csv")
    df.write.option("header", "true").mode("overwrite").csv(csv_dir)

    inferred = csv_read_inferred(spark, csv_dir)
    explicit = csv_read_explicit(spark, csv_dir)
    assert [(f.name, f.dataType) for f in explicit.schema.fields] == [
        (f.name, f.dataType) for f in SALES_SCHEMA.fields
    ]
    assert explicit.count() == inferred.count() == 2_000
    # inference widened types are at least read-compatible
    assert isinstance(inferred.schema["order_id"].dataType, (T.IntegerType, T.LongType))
