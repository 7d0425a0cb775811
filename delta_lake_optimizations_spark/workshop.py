"""The reference workshop's own lab surface, re-expressed on this engine.

Everything in reference ``docs/02-lab-optimizations.md`` that is not a
maintenance verb lives here: the synthetic ``sales`` generator (S1 + P3-P8,
``:30-74``), the wall-clock measurement harness (§2.7, ``:95-104``), CSV
reads with inferred vs explicit schema (S7/S8, ``:483-583``), the caching
exercise (C1-C4, ``:402-479``), and ``run_workshop`` — the whole lab
narrative as one executable, assertable flow instead of screenshots.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

# The canonical sales schema, declared twice identically in the reference
# (generation ``:34-44``, CSV read ``:554-564``).
SALES_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("order_ts", T.TimestampType()),
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("status", T.StringType()),
    ]
)

COUNTRIES = ["US", "DE", "FR", "BR", "MX", "ES", "IT", "UK", "CA", "JP"]
CATEGORIES = ["electronics", "books", "clothing", "home", "sports", "toys"]
STATUSES = ["delivered", "shipped", "processing", "cancelled"]


def generate_sales(spark: SparkSession, n_rows: int = 100_000, n_parts: int = 16, seed: int = 7) -> DataFrame:
    """S1: synthesize the lab's sales table (reference ``:54-65``) —
    ``spark.range`` plus rand-driven columns, ending with ``drop("id")``.
    Fully distributed: no driver-side data, scales to the reference's 5M
    rows (and far beyond) by bumping ``n_rows``/``n_parts``."""

    def pick(options: list[str], r: F.Column) -> F.Column:
        # P7: 1-based element_at over a literal array (reference :59-64)
        return F.element_at(
            F.array(*[F.lit(o) for o in options]),
            (r * len(options)).cast("int") + 1,
        )

    df = (
        spark.range(n_rows)
        .repartition(n_parts)
        .withColumn("order_id", F.col("id"))
        .withColumn(
            "order_ts",
            (
                F.lit("2024-01-01").cast("timestamp").cast("double")
                + (F.rand(seed) * 365 * 24 * 3600)
            ).cast("timestamp"),
        )
        .withColumn("customer_id", (F.rand(seed + 1) * 100_000).cast("int"))
        .withColumn("country", pick(COUNTRIES, F.rand(seed + 2)))
        .withColumn("category", pick(CATEGORIES, F.rand(seed + 3)))
        .withColumn("price", F.round(F.rand(seed + 4) * 500 + 1, 2))
        .withColumn("quantity", (F.rand(seed + 5) * 9 + 1).cast("int"))
        .withColumn("total", F.round(F.col("price") * F.col("quantity"), 2))
        .withColumn("status", pick(STATUSES, F.rand(seed + 6)))
        .drop("id")
    )
    return df


def bench(fn: Callable[[], Any], label: str = "", quiet: bool = True) -> tuple[Any, float]:
    """§2.7: the reference's measurement harness — wall-clock an action
    (``⏱ ... took: X.XXs``, reference ``:95-104``)."""
    t0 = time.time()
    result = fn()
    elapsed = time.time() - t0
    if not quiet:
        print(f"⏱ {label or getattr(fn, '__name__', 'action')} took: {elapsed:.2f}s")
    return result, elapsed


def csv_read_inferred(spark: SparkSession, path: str) -> DataFrame:
    """S7: the anti-pattern — header CSV with ``inferSchema`` (costs a full
    extra scan before the real read; reference ``:483-537``)."""
    return (
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    )


def csv_read_explicit(
    spark: SparkSession, path: str, schema: T.StructType = SALES_SCHEMA
) -> DataFrame:
    """S8: the taught best practice — explicit ``StructType``, no inference
    scan (reference ``:554-572``)."""
    return spark.read.option("header", "true").schema(schema).csv(path)


_STORAGE_LEVELS = {
    "MEMORY_AND_DISK": StorageLevel.MEMORY_AND_DISK,
    "MEMORY_ONLY": StorageLevel.MEMORY_ONLY,
    "DISK_ONLY": StorageLevel.DISK_ONLY,
    "MEMORY_AND_DISK_DESER": StorageLevel.MEMORY_AND_DISK_DESER,
    "OFF_HEAP": StorageLevel.OFF_HEAP,
}


def persist(df: DataFrame, level: str = "MEMORY_AND_DISK") -> DataFrame:
    """C1/C2 (reference ``:415-421``): ``cache()`` is
    ``persist(MEMORY_AND_DISK)``; other levels by name."""
    return df.persist(_STORAGE_LEVELS[level])


def clear_all_cache(spark: SparkSession) -> None:
    """C4 (reference ``:173``): drop all cached blocks before re-measuring."""
    spark.catalog.clearCache()


def run_workshop(
    spark: SparkSession,
    root: str,
    n_rows: int = 100_000,
    n_small_files: int = 64,
) -> dict[str, Any]:
    """The complete lab narrative (reference docs/02-lab-optimizations.md)
    as one flow. Returns a report dict with every number the lab reads off
    screenshots, so tests can assert the *relative* claims (SURVEY §6).

    Steps: generate (S1) → write many small files (S9/S2) → baseline
    selective scan (P9, ``country='US' AND category='electronics'``) →
    OPTIMIZE VORDER (M1/M2) → rerun scan → cache + recount (C1) → DELETE /
    time travel / RESTORE (M7/M9/M10) → VACUUM DRY RUN (M4) → history (M6).
    """
    import os

    from delta_lake_optimizations_spark.frontdoor import GraftCatalog
    from delta_lake_optimizations_spark.stats import StatisticsStore

    report: dict[str, Any] = {}
    cat = GraftCatalog(spark)
    sales_path = os.path.join(root, "sales")

    df = generate_sales(spark, n_rows=n_rows, n_parts=n_small_files)
    cat.create("sales", df, sales_path)
    t = cat.table("sales")
    report["filesBefore"] = len(t.snapshot().files)

    flagship = "SELECT COUNT(*) AS n FROM sales WHERE country = 'US' AND category = 'electronics'"
    clear_all_cache(spark)
    baseline_rows, report["baselineScanSec"] = bench(lambda: cat.sql(flagship).collect())
    report["flagshipCount"] = baseline_rows[0]["n"]

    # Python-API optimize with an explicit output file count so file-level
    # skipping stays observable at test scale (the SQL statement form is
    # exercised in tests/test_frontdoor.py); at real scale the 128-512 MB
    # target produces many files per table anyway.
    from delta_lake_optimizations_spark.table.maintenance import optimize

    optimize(
        t,
        zorder_by=["country", "category"],
        vorder=True,
        target_files=max(4, n_small_files // 8),
    )
    cat._refresh("sales")
    report["filesAfterOptimize"] = len(t.snapshot().files)
    clear_all_cache(spark)
    rows2, report["optimizedScanSec"] = bench(lambda: cat.sql(flagship).collect())
    report["flagshipCountAfterOptimize"] = rows2[0]["n"]
    report["filesScannedFlagship"] = t.files_scanned(
        skip_where=[("country", "=", "US"), ("category", "=", "electronics")]
    )

    cached = persist(t.load().filter(F.col("country") == "US"))
    _, report["firstCachedCountSec"] = bench(lambda: cached.count())
    _, report["recountCachedSec"] = bench(lambda: cached.count())
    cached.unpersist()

    n_before = t.load().count()
    cat.sql("DELETE FROM sales WHERE status = 'cancelled'")
    report["countAfterDelete"] = t.load().count()
    v_pre_delete = t.snapshot().version - 1
    report["countTimeTravel"] = cat.sql(
        f"SELECT COUNT(*) AS n FROM sales VERSION AS OF {v_pre_delete}"
    ).collect()[0]["n"]
    assert report["countTimeTravel"] == n_before

    cat.sql(f"RESTORE TABLE sales TO VERSION AS OF {v_pre_delete}")
    report["countAfterRestore"] = t.load().count()

    report["vacuumDryRunFiles"] = len(cat.sql("VACUUM sales RETAIN 0 HOURS DRY RUN").collect())
    StatisticsStore(t).collect()
    report["history"] = [r["operation"] for r in cat.sql("DESCRIBE HISTORY sales").collect()]
    return report
