"""IVF (inverted-file) approximate nearest-neighbor search (SURVEY §2.9 X3).

The scale path for ANN beyond hyperplane LSH: partition the vector space
into ``nlist`` Voronoi cells (k-means centroids), store each vector in its
cell's posting list, and at query time probe only the ``nprobe`` nearest
cells — the classic IVF-Flat design from the FAISS / Jegou et al. lineage,
expressed in Spark primitives:

- **build**: ``pyspark.ml`` KMeans (seeded, deterministic) fits on a
  sample; assignment is one ``transform`` pass — both distributed.
- **search**: centroid scan is driver-side (``nlist`` is small by design,
  e.g. 4096 at 1e9 vectors); candidates come from a partition-pruned
  filter ``list_id IN (probes)``, then exact cosine re-rank with
  ``TakeOrderedAndProject`` (per-partition top-k, driver merge).

At 100 TB the assigned table would be written as a GraftTable partitioned
by ``list_id`` so the probe filter prunes whole files/directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.operators.similarity import topk_cosine
from delta_lake_optimizations_spark.registry import query


def ivf_build(
    df: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit centroids and assign every vector to its nearest cell.

    Returns ``(assigned_df, centroids)`` where ``assigned_df`` is the input
    plus a ``list_id`` int column, and ``centroids`` is the nlist x dim
    list (small, driver-side — it IS the index metadata).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featured = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    fit_input = featured
    if sample_fraction is not None:
        fit_input = featured.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=nlist, seed=seed, featuresCol="__features", predictionCol="list_id").fit(
        fit_input
    )
    assigned = model.transform(featured).drop("__features")
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` cells nearest the query, exact-rerank to top-k."""
    import math

    def sqdist(a: list[float], b: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: sqdist(centroids[i], query_vec))
    probes = order[:nprobe]
    cand = assigned.filter(F.col("list_id").isin(probes))
    return topk_cosine(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


@query("ann_ivf_topk", tags=("similarity", "approx"))
def ann_ivf_topk(spark, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-10 for vec_id=0 (rows-only driver check;
    pytest pins recall vs brute force and centroid determinism)."""
    from delta_lake_optimizations_spark.catalog import load_table
    from delta_lake_optimizations_spark.operators.similarity import query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir, 0)
    assigned, centroids = ivf_build(emb, nlist=8, seed=7)
    return ivf_search(assigned, centroids, qv, k=10, nprobe=4)
