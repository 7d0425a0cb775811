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
from delta_lake_optimizations_spark.queries.vectors import (
    cosine_with_norms,
    l2_norm_py,
    norm_col,
)
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


def _knn_join_cells(
    assigned: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The cell-blocked k-NN join tail shared by the inline and indexed
    forms: probe map (nlist x nprobe, driver-side — tiny by design)
    broadcast against the assigned frame, candidates equi-joined on the
    cell id — shuffle on ``list_id``, quadratic only WITHIN a cell,
    never across the corpus — exact cosine + per-src top-k window."""
    import math

    from pyspark.sql import Window

    def sqdist(a: list[float], b: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(a, b))

    probe_rows = []
    for i, ci in enumerate(centroids):
        order = sorted(range(len(centroids)), key=lambda j: sqdist(ci, centroids[j]))
        for j in order[:nprobe]:
            probe_rows.append((i, j))
    probes = assigned.sparkSession.createDataFrame(
        probe_rows, "list_id int, probe_id int"
    )

    # r11 norm-once: per-side norms projected once per row BEFORE the
    # cell join — per-pair work inside a cell is the dot alone.
    left = (
        assigned.select(
            F.col(id_col).alias("src_id"),
            F.col(vec_col).alias("_qv"),
            norm_col(F.col(vec_col)).alias("_qn"),
            "list_id",
        )
        .join(F.broadcast(probes), "list_id")
        .select("src_id", "_qv", "_qn", F.col("probe_id").alias("_cell"))
    )
    right = assigned.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("_nv"),
        norm_col(F.col(vec_col)).alias("_nn"),
        F.col("list_id").alias("_cell"),
    )
    w = Window.partitionBy("src_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id"))
    return (
        left.join(right, ["_cell"])
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select(
            "src_id",
            "nbr_id",
            F.round(
                cosine_with_norms(
                    F.col("_qv"), F.col("_nv"), F.col("_qn"), F.col("_nn")
                ),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_knn_join(
    df: DataFrame,
    nlist: int = 16,
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Approximate k-NN JOIN (every row, not one query) blocked by IVF
    cells: each vector's candidates are the vectors assigned to its own
    cell plus its ``nprobe - 1`` next-nearest cells.

    This is the INLINE form (fits KMeans per call — right for one-off
    exploration); ``knn_join_from_ivf_index`` answers the same join from
    a materialized index with no refit. On clustered embeddings (the
    realistic case) recall is high because true neighbours share a
    Voronoi cell; see tests/test_ann_and_components.py for the pinned
    recall bound.
    """
    assigned, centroids = ivf_build(
        df, nlist=nlist, vec_col=vec_col, id_col=id_col, seed=seed,
        sample_fraction=sample_fraction,
    )
    return _knn_join_cells(assigned, centroids, nprobe, k, id_col, vec_col)


def knn_join_from_ivf_index(
    table,
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN JOIN answered from the MATERIALIZED IVF index: cell
    assignments come off the stored table (one pruned columnar scan) and
    the probe map from the stored centroids — no KMeans fit at query
    time, the batch sibling of ``ann_topk_from_ivf_index``. The same
    works against an IVF-PQ table (its layout is a superset: the raw
    vector column rides along for exactly this kind of exact-math
    consumer; per-query ADC LUTs don't apply to a whole-corpus join)."""
    centroids = ivf_index_centroids(table)
    assigned = table.load().select("list_id", id_col, vec_col)
    return _knn_join_cells(assigned, centroids, nprobe, k, id_col, vec_col)


@query("knn_join_ivf", tags=("similarity", "approx", "knn"))
def knn_join_ivf(spark, sf_dir: str) -> DataFrame:
    """Approximate 3-NN join blocked by IVF cells (rows-only driver
    check; pytest pins recall >= 0.8 on clustered vectors at a bounded
    candidate fraction)."""
    from delta_lake_optimizations_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_knn_join(emb, nlist=8, nprobe=3, k=3)


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


# ---------------------------------------------------------------------------
# Materialized IVF index (VERDICT r04 #2): the assigned table written as a
# GraftTable PARTITIONED BY list_id, centroids carried in table properties.
# A probe loads only the nprobe partitions nearest the query — hive-dir +
# stats pruning through the engine's own skip_where machinery — so query
# IO is nprobe/nlist of the index at any scale. Build is one distributed
# KMeans fit + assignment pass, paid once per corpus.
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import json as _json
import os as _os
import tempfile as _tempfile

CENTROIDS_PROP = "graft.ivf.centroids"


def build_ivf_index(
    spark,
    df: DataFrame,
    path: str,
    nlist: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    sample_fraction: float | None = None,
):
    """Materialize the IVF index: ``(list_id, id, vector)`` partitioned by
    ``list_id`` (one hive dir per Voronoi cell), centroids JSON in the
    table properties (nlist x dim floats — index metadata small enough for
    the commit log at any realistic nlist; a 4096x768 deployment would put
    ~25 MB there, at which point a sidecar parquet is the right home, same
    pattern as the bloom sidecars). Returns the table handle."""
    from delta_lake_optimizations_spark.table import GraftTable

    assigned, centroids = ivf_build(
        df, nlist=nlist, vec_col=vec_col, id_col=id_col, seed=seed,
        sample_fraction=sample_fraction,
    )
    t = GraftTable(spark, path)
    t.write(
        assigned.select("list_id", id_col, vec_col),
        mode="overwrite",
        partition_by=["list_id"],
        properties={
            CENTROIDS_PROP: _json.dumps(
                [[round(x, 8) for x in c] for c in centroids]
            ),
            "graft.ivf.nlist": str(nlist),
            # one writer task per cell -> one file per hive partition
            # (instead of tasks x cells small files); the probe then reads
            # exactly nprobe files
            "graft.optimizeWrite": "true",
        },
    )
    return t


def ivf_index_centroids(table) -> list[list[float]]:
    """Centroid matrix back out of the table properties."""
    return _json.loads(table.snapshot().properties[CENTROIDS_PROP])


def ann_topk_from_ivf_index(
    table,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k from the materialized IVF index: rank centroids driver-side
    (nlist is small by design), load ONLY the nprobe nearest cells'
    partitions (``list_id IN probes`` -> hive-partition pruning), exact
    cosine re-rank. No KMeans fit, no full scan, at query time."""
    import math

    centroids = ivf_index_centroids(table)

    def sqdist(a: list[float], b: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: sqdist(centroids[i], query_vec))
    probes = order[:nprobe]
    cand = table.load(skip_where=[("list_id", "in", probes)]).select(id_col, vec_col)
    return topk_cosine(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_topk_batch_from_ivf(
    table,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k for a BATCH of queries from the materialized IVF index in
    ONE plan (columns ``qid, <id_col>, cos_sim``): per-query probe cells
    rank driver-side (nlist is tiny), the UNION of probed cells drives a
    single partition-pruned load, the (qid, list_id) probe map broadcast-
    joins candidates to their queries, and the per-query exact-cosine
    top-k reduces skew-free (``topk_per_query``). Candidates per query
    are IDENTICAL to ``ann_topk_from_ivf_index`` at the same nprobe, so
    results match the single-query probe row-for-row (pinned by pytest) —
    what batching buys is amortization: one scan setup, one plan compile,
    one job for Q queries instead of Q of each."""
    import math

    from delta_lake_optimizations_spark.operators.similarity import (
        topk_per_query,
    )

    centroids = ivf_index_centroids(table)

    def sqdist(a: list[float], b: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(a, b))

    probe_rows: list[tuple[int, int]] = []
    cells: set[int] = set()
    for qid, qv in queries:
        order = sorted(range(len(centroids)), key=lambda i: sqdist(centroids[i], qv))
        for c in order[:nprobe]:
            probe_rows.append((int(qid), int(c)))
            cells.add(int(c))
    spark = table.spark
    # r11 norm-once: query norms fold driver-side (bit-identical, see
    # l2_norm_py) and ride the broadcast row; the corpus norm projects
    # once per candidate row BELOW the fanout joins, so the generated
    # loop reuses it across every (qid, row) pair.
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v], l2_norm_py(v)) for q, v in queries],
        "qid long, _qv array<double>, _qn double",
    )
    pdf = spark.createDataFrame(probe_rows, "qid long, list_id int")
    cand = table.load(skip_where=[("list_id", "in", sorted(cells))]).select(
        "list_id", id_col, vec_col, norm_col(F.col(vec_col)).alias("_vn")
    )
    scored = (
        cand.join(F.broadcast(pdf), "list_id")
        .join(F.broadcast(qdf), "qid")
        .select(
            "qid",
            id_col,
            F.round(
                cosine_with_norms(
                    F.col(vec_col), F.col("_qv"), F.col("_vn"), F.col("_qn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_query(scored, k, "qid", id_col)


def ivf_probe_files_scanned(table, query_vec: list[float], nprobe: int = 4) -> int:
    """Index files the probe reads (partition pruning, driver-side)."""
    import math

    centroids = ivf_index_centroids(table)

    def sqdist(a: list[float], b: list[float]) -> float:
        return math.fsum((x - y) ** 2 for x, y in zip(a, b))

    order = sorted(range(len(centroids)), key=lambda i: sqdist(centroids[i], query_vec))
    return table.files_scanned(skip_where=[("list_id", "in", order[:nprobe])])


def _ivf_corpus_fingerprint(sf_dir: str) -> str:
    from delta_lake_optimizations_spark.operators.lsh_index import _corpus_fingerprint

    return _corpus_fingerprint(sf_dir)


def _cached_ivf_index(spark, sf_dir: str, nlist: int = 8):
    """Build-once-per-corpus IVF index (content-fingerprinted cache key,
    same scheme as the LSH index caches)."""
    from delta_lake_optimizations_spark.catalog import load_table
    from delta_lake_optimizations_spark.table import GraftTable

    key = _hashlib.sha256(
        f"{_os.path.abspath(sf_dir)}|ivf|{nlist}|"
        f"{_ivf_corpus_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:16]
    path = _os.path.join(_tempfile.gettempdir(), "spark_graft_ivf_index", key)
    t = GraftTable(spark, path)
    if not t.exists():
        emb = load_table(spark, sf_dir, "embeddings")
        t = build_ivf_index(spark, emb, path, nlist=nlist, seed=7)
    return t


@query("ann_ivf_topk_indexed", tags=("similarity", "approx", "index"))
def ann_ivf_topk_indexed(spark, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-10 for vec_id=0 served from the
    MATERIALIZED index (list_id-partitioned GraftTable, centroids from
    table properties): no per-query KMeans fit, and the probe reads only
    nprobe/nlist of the index via partition pruning. (Rows-only driver
    check; ``ann_ivf_indexed_matches_inline`` is the oracle-backed
    equivalence metric.)"""
    from delta_lake_optimizations_spark.operators.similarity import query_vector

    t = _cached_ivf_index(spark, sf_dir, nlist=8)
    qv = query_vector(spark, sf_dir, 0)
    return ann_topk_from_ivf_index(t, qv, k=10, nprobe=4)


@query("knn_join_ivf_indexed", tags=("similarity", "approx", "knn", "index"))
def knn_join_ivf_indexed(spark, sf_dir: str) -> DataFrame:
    """Approximate 3-NN join for EVERY vector, answered from the
    materialized IVF index (stored assignments + stored centroids, no
    refit). (Rows-only driver check; ``knn_join_ivf_matches_inline`` is
    the oracle-backed equivalence metric.)"""
    t = _cached_ivf_index(spark, sf_dir, nlist=8)
    return knn_join_from_ivf_index(t, nprobe=3, k=3)


def assign_to_centroids(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment against FIXED centroids (no refit) —
    one Arrow-batched numpy argmin pass; used by the index append path so
    increments join the same Voronoi cells as the original build."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)  # (nlist, dim)
    Cn = (C * C).sum(axis=1)  # |c|^2, reused per batch

    def nearest(emb):
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in emb])
        # argmin over |x-c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row
        d = Cn[None, :] - 2.0 * (X @ C.T)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    nearest.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    udf = pandas_udf("int")(nearest)
    return df.withColumn("list_id", udf(F.col(vec_col)))


def append_to_ivf_index(table, df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        extra_parameters: dict | None = None) -> None:
    """Absorb new vectors into an existing IVF index WITHOUT refitting:
    assign against the STORED centroids (table properties) and append —
    rows land in their cells' hive partitions, so probes keep reading
    nprobe cells only. Centroid drift under heavy append is the standard
    IVF trade; rebuild with ``build_ivf_index`` when recall decays."""
    centroids = ivf_index_centroids(table)
    assigned = assign_to_centroids(df, centroids, vec_col=vec_col)
    table.write(
        assigned.select("list_id", id_col, vec_col),
        mode="append",
        partition_by=["list_id"],
        extra_parameters=extra_parameters,
    )
