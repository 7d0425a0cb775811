"""Deterministic dataset splitting & sampling (SURVEY §2.9 extensions).

Every training pipeline needs reproducible train/val/test assignment and
stratified subsampling. Random sampling (``df.sample``) is seed- and
partitioning-dependent; these operators instead key every decision on the
md5 of a stable id, so the assignment is a pure function of the row —
identical across runs, cluster sizes, AND engines (Spark and DuckDB emit
byte-identical md5 hex, which is what makes the oracle comparison
possible).

Scale: both operators are one narrow projection plus (for stratified
sampling) one window partitioned by the stratum key — a single shuffle on
the stratum, no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def _hash_hex(key: Column) -> Column:
    """md5 hex of the stringified key — uniform over [0,16^32), stable."""
    return F.md5(key.cast("string").cast("binary"))


def _threshold_hex(fraction: float) -> str:
    """Hex-string threshold t such that P(md5_hex < t) == fraction (to
    32-bit precision), comparable lexicographically against the full
    32-char digest."""
    return format(int(fraction * 0x100000000), "08x")


def hash_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.9,
    val: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hashed key: train gets ``train`` of the
    mass, val the next ``val``, test the rest. Pure projection — no
    shuffle, no state, re-runs and backfills always agree."""
    h = _hash_hex(F.col(key_col))
    t_train = _threshold_hex(train)
    t_val = _threshold_hex(train + val)
    return df.withColumn(
        split_col,
        F.when(h < t_train, F.lit("train"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Deterministic n-per-stratum sample: rank rows within each stratum
    by hashed key (uniform, reproducible) and keep the first n. One
    shuffle on the stratum key; each partition ranks locally."""
    h = _hash_hex(F.col(key_col))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


@query(
    "dataset_hash_split",
    tags=("sampling", "split"),
    oracle=f"""
        SELECT doc_id,
               CASE
                   WHEN md5(CAST(doc_id AS VARCHAR)) < '{_threshold_hex(0.9)}' THEN 'train'
                   WHEN md5(CAST(doc_id AS VARCHAR)) < '{_threshold_hex(0.95)}' THEN 'val'
                   ELSE 'test'
               END AS split
        FROM documents
    """,
)
def dataset_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment keyed on md5(doc_id)."""
    documents = load_table(spark, sf_dir, "documents")
    return hash_split(documents, "doc_id").select("doc_id", "split")


@query(
    "stratified_sample_by_source",
    tags=("sampling", "stratified"),
    oracle="""
        SELECT doc_id, source
        FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM documents
        ) t
        WHERE rn <= 25
    """,
)
def stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 documents per source, chosen by hash rank — the balanced-
    subsample op (per-domain caps) of corpus curation."""
    documents = load_table(spark, sf_dir, "documents")
    return stratified_sample(documents, "source", 25, "doc_id").select("doc_id", "source")
