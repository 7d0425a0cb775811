"""Public function library: the engine's reusable column expressions.

Everything here is a Column-in/Column-out builder over JVM built-ins
(whole-stage codegen, no Python in the data path) — the building blocks
the query modules and operators compose. Import surface::

    from delta_lake_optimizations_spark.functions import (
        tokenize, token_ngrams, dot, cosine, l2_norm_sq,
        charge, disc_price,
    )
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.dedup import token_ngrams, tokenize
from delta_lake_optimizations_spark.queries.vectors import cosine, dot, l2_norm_sq
from delta_lake_optimizations_spark.temporal import epoch_seconds


def disc_price(extendedprice: Column, discount: Column) -> Column:
    """TPC-H discounted price: ``extendedprice * (1 - discount)``."""
    return extendedprice * (1 - discount)


def charge(extendedprice: Column, discount: Column, tax: Column) -> Column:
    """TPC-H charge: discounted price with tax."""
    return disc_price(extendedprice, discount) * (1 + tax)


def null_safe_div(num: Column, den: Column) -> Column:
    """NULL instead of error/inf on zero denominators (ANSI-safe ratio)."""
    return F.when(den != 0, num / den)




__all__ = [
    "tokenize",
    "token_ngrams",
    "dot",
    "cosine",
    "l2_norm_sq",
    "disc_price",
    "charge",
    "null_safe_div",
    "epoch_seconds",
]
