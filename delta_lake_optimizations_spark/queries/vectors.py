"""Array / vector queries over the ``embeddings`` table (SURVEY.md §2.8).

Oracle-parity note on floats: the embedding column is ``array<float>``.
Both sides cast each element to DOUBLE before multiplying and accumulate
left-to-right (Spark ``F.aggregate`` and DuckDB ``list_*`` both fold
sequentially), so the doubles are bitwise identical and rounding is safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query


def l2_norm_sq(col: Column) -> Column:
    """Sum of squared elements, accumulated in double, left-to-right."""
    return F.aggregate(
        col,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def norm_col(col: Column) -> Column:
    """``sqrt(l2_norm_sq)`` — exactly the per-side factor ``cosine`` uses.

    Optimization seam (r11, guide §2.3 "shuffle fewer bytes"/§1.2 "the
    distributed algorithm"): every per-PAIR cosine in a join recomputes
    both sides' norms per pair — 3x dim fold work where the dot alone
    needs dim. Projecting ``norm_col`` ONCE per side before the join and
    dividing by the product gives bit-identical doubles (same fold, same
    operand order, just evaluated once per row instead of once per pair).
    """
    return F.sqrt(l2_norm_sq(col))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine(a, b)`` with the two norm factors precomputed (see
    ``norm_col``). ``na``/``nb`` MUST be ``norm_col`` of ``a``/``b`` in
    the same operand order cosine() uses — pinned bit-exact by
    tests/test_vector_norm_once.py."""
    return dot(a, b) / (na * nb)


def l2_norm_py(vec) -> float:
    """Driver-side twin of ``norm_col`` for a LITERAL query vector:
    left-to-right sequential fold in IEEE double — bit-identical to the
    Spark fold over the same literal array (Python float IS an IEEE
    double; ``math.sqrt`` is the same sqrt). Lets single-query paths pass
    the query norm as one literal instead of re-folding a constant
    per row (HOF aggregates are not constant-folded by Catalyst)."""
    import math

    acc = 0.0
    for x in vec:
        v = float(x)
        acc += v * v
    return math.sqrt(acc)


# Perf note (measured, round 4, 100k x dim-64 corpus): expanding these
# folds to element_at chains or balanced trees of plain arithmetic — to
# dodge the CodegenFallback that F.aggregate/F.zip_with impose on their
# stage — changes nothing (fold 0.36 s, chain 0.39 s, tree 0.38 s per
# scan): the scan+top-k overhead dominates, and Janino chokes on very
# deep nested chains anyway (192-dot LSH-build selects planned for
# minutes). The folds stay; don't re-try the expansion without new
# evidence.


@query(
    "vector_norms",
    tags=("vector",),
    oracle="""
        SELECT
            vec_id,
            len(embedding) AS dim,
            ROUND(
                SQRT(list_sum(list_transform(
                    embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                ))),
                4
            ) AS l2_norm
        FROM embeddings
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector length + L2 norm via F.aggregate (JVM-side fold, no UDF)."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(l2_norm_sq(F.col("embedding"))), 4).alias("l2_norm"),
    )


@query(
    "vector_head_stats",
    tags=("vector",),
    oracle="""
        SELECT
            vec_id,
            label,
            embedding[1] AS e0,
            ROUND(
                list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
                6
            ) AS head_sum
        FROM embeddings
    """,
)
def vector_head_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array indexing + slice + fold (element_at / slice / aggregate)."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    head_sum = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return embeddings.select(
        "vec_id",
        "label",
        F.element_at("embedding", 1).alias("e0"),
        F.round(head_sum, 6).alias("head_sum"),
    )


@query(
    "vector_label_centroids",
    tags=("vector", "agg"),
    oracle="""
        SELECT
            label,
            CAST(p.pos AS BIGINT) AS pos,
            ROUND(AVG(CAST(embedding[p.pos] AS DOUBLE)), 6) AS centroid_val
        FROM embeddings, (SELECT UNNEST([1, 2, 3, 4]) AS pos) p
        GROUP BY label, p.pos
    """,
)
def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the first 4 dimensions via posexplode + avg.

    The explode + groupBy(label, pos) shape distributes the per-dimension
    mean across the cluster — the scalable way to average vectors (no
    driver-side accumulation).
    """
    embeddings = load_table(spark, sf_dir, "embeddings")
    return (
        embeddings.select(
            "label", F.posexplode(F.slice("embedding", 1, 4)).alias("pos0", "val_f")
        )
        .select(
            "label",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.col("val_f").cast("double").alias("val"),
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid_val"))
    )
