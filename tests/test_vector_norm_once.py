"""Bit-exactness pins for the r11 norm-once cosine optimization.

``cosine_with_norms(a, b, norm_col(a), norm_col(b))`` must produce the
IDENTICAL IEEE doubles as ``cosine(a, b)`` — same fold, same operand
order, the norms just evaluated once per row instead of once per pair —
and ``l2_norm_py`` (the driver-side fold used for literal query vectors)
must match the Spark-evaluated ``norm_col`` bit for bit. Every ANN /
decontam join path now leans on these identities; a single ULP of drift
would silently break oracle parity on the 6-dp rounded similarity
columns, so the comparison here is exact equality (via struct pack),
not isclose.
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.queries.vectors import (
    cosine,
    cosine_with_norms,
    l2_norm_py,
    norm_col,
)

# Awkward doubles on purpose: denormal-adjacent, huge/tiny mixes that
# round differently under any re-association, negative zero, and values
# whose squares lose low bits.
VECS = [
    [1.0, 2.0, 3.0, 4.0],
    [0.1, 0.2, 0.30000000000000004, -0.7],
    [1e-30, -1e-30, 3.141592653589793, 2.718281828459045],
    [-0.0, 1e-37, 2.5e30, -123.456789],
    [0.333333333333333314829616256247, 3.0, -3.0, 0.1 + 0.2],
    [7.0, 11.0, 13.0, 17.0],
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", float(x))


def test_cosine_with_norms_bit_identical(spark):
    rows = [(i, VECS[i], VECS[(i + 1) % len(VECS)]) for i in range(len(VECS))]
    df = spark.createDataFrame(rows, "i int, a array<double>, b array<double>")
    out = (
        df.select(
            "i",
            cosine(F.col("a"), F.col("b")).alias("plain"),
            cosine_with_norms(
                F.col("a"),
                F.col("b"),
                norm_col(F.col("a")),
                norm_col(F.col("b")),
            ).alias("once"),
        )
        .orderBy("i")
        .collect()
    )
    assert len(out) == len(VECS)
    for r in out:
        assert _bits(r["plain"]) == _bits(r["once"]), (
            r["i"],
            r["plain"].hex(),
            r["once"].hex(),
        )


def test_l2_norm_py_matches_spark_literal_fold(spark):
    for v in VECS:
        lit = F.array(*[F.lit(float(x)) for x in v])
        got = spark.range(1).select(norm_col(lit).alias("n")).first()["n"]
        assert _bits(got) == _bits(l2_norm_py(v)), (v, got.hex())


def test_l2_norm_py_matches_spark_array_double_column(spark):
    # The batch paths ship query vectors through createDataFrame as
    # array<double> rows — the Spark fold over the COLUMN must also
    # match the driver-side fold.
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(VECS)], "i int, v array<double>"
    )
    got = {r["i"]: r["n"] for r in df.select("i", norm_col(F.col("v")).alias("n")).collect()}
    for i, v in enumerate(VECS):
        assert _bits(got[i]) == _bits(l2_norm_py(v)), (i, v)


def test_l2_norm_py_matches_spark_float_column(spark):
    # Corpus vectors are array<float>: norm_col casts each element to
    # double before squaring. l2_norm_py(float32-rounded values) must
    # match when fed the same post-cast doubles.
    fvecs = [[struct.unpack("<f", struct.pack("<f", x))[0] for x in v] for v in VECS]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fvecs)], "i int, v array<float>"
    )
    got = {r["i"]: r["n"] for r in df.select("i", norm_col(F.col("v")).alias("n")).collect()}
    for i, v in enumerate(fvecs):
        assert _bits(got[i]) == _bits(l2_norm_py(v)), (i, v)


def test_zero_vector_parity_both_raise(spark):
    # 0-norm vectors: under ANSI mode (Spark 4 default) BOTH forms raise
    # DIVIDE_BY_ZERO — the optimization does not change the error
    # behavior either.
    import pytest
    from pyspark.errors import ArithmeticException

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    with pytest.raises(ArithmeticException):
        df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    with pytest.raises(ArithmeticException):
        df.select(
            cosine_with_norms(
                F.col("a"), F.col("b"), norm_col(F.col("a")), norm_col(F.col("b"))
            ).alias("c")
        ).collect()
