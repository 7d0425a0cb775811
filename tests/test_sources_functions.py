"""Sources + function-library smoke tests: JSONL round trip with explicit
schema, and the reusable column builders."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.functions import (
    charge,
    cosine,
    disc_price,
    null_safe_div,
    tokenize,
)
from delta_lake_optimizations_spark.sources import read_jsonl, write_jsonl

from .conftest import SF_DIR


def test_jsonl_roundtrip_explicit_schema(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = str(tmp_path / "nation_jsonl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, df.schema)
    assert back.schema == df.schema  # no inference drift
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_function_builders(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(100)
    row = li.select(
        disc_price(F.col("l_extendedprice"), F.col("l_discount")).alias("dp"),
        charge(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")).alias("ch"),
        null_safe_div(F.lit(1.0), F.lit(0.0)).alias("nsd"),
    ).first()
    assert row["dp"] > 0 and row["ch"] >= row["dp"]
    assert row["nsd"] is None

    toks = spark.createDataFrame([("Hello  World x",)], ["t"]).select(
        tokenize(F.col("t")).alias("toks")
    ).first()["toks"]
    assert toks == ["hello", "world", "x"]

    sim = (
        spark.createDataFrame([([1.0, 0.0], [1.0, 0.0])], ["a", "b"])
        .select(cosine(F.col("a"), F.col("b")).alias("c"))
        .first()["c"]
    )
    assert abs(sim - 1.0) < 1e-9


def test_variant_try_get_tolerates_malformed_json(spark):
    """``try_parse_json``/``try_variant_get`` contract for dirty corpora
    (promised in ``queries/reshape.py::variant_props_rollup``): malformed
    documents and missing/mistyped paths degrade to NULL, never to a
    failed job — the property that lets a 100 TB ingest keep running when
    one shard holds a few broken payloads."""
    from pyspark.sql import functions as F

    rows = [
        ('{"k": 7}',),          # clean
        ('{"k": "notanint"}',), # present but non-numeric
        ('{"j": 1}',),          # path absent
        ('{broken',),           # malformed JSON
        (None,),                # null payload
    ]
    df = spark.createDataFrame(rows, ["props"]).select(
        F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint").alias("k")
    )
    assert [r["k"] for r in df.collect()] == [7, None, None, None, None]
