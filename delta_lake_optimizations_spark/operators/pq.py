"""Product-quantized (PQ) vector compression + asymmetric-distance search.

The public FAISS/Jegou-et-al. design ("Product Quantization for Nearest
Neighbor Search", TPAMI 2011): split each D-dim vector into M subvectors,
k-means each subspace into ``ksub`` sub-centroids, and store M small
codes per vector — compressing ``4*D`` float bytes to ``M`` code bytes
(e.g. 128x for D=768, M=24, ksub=256). Queries score compressed codes
via Asymmetric Distance Computation (ADC): a query-specific M x ksub
lookup table of exact subdistances, summed per code.

Spark-first split of the work:

- **train** (``pq_train``): one ``pyspark.ml`` KMeans per subspace on a
  sample — M small distributed fits; the codebook (M x ksub x D/M
  floats) is index METADATA, driver-held and broadcastable.
- **encode** (``pq_encode``): vectorized NumPy argmin inside Arrow-
  batched ``mapInPandas`` — the heavy per-row math rides C loops over
  whole batches, the canonical "Python only via Arrow" fast path.
- **search** (``pq_search``): the ADC lookup table is built driver-side
  from the query (tiny), then embedded as LITERAL arrays so scoring is
  pure JVM expressions — ``element_at`` per code + sum — inside
  whole-stage codegen over the compressed column. No Python, no
  full-precision vectors touched until the optional exact re-rank of
  the short candidate list (``refine``).

At 100 TB the encoded table is what you keep hot (bytes per vector, not
KBs); full-precision vectors stay cold for the refine step only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.queries.vectors import cosine
from delta_lake_optimizations_spark.registry import query


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Fit M per-subspace codebooks (each ksub x D/M). Dimension D must
    divide evenly by ``m``. Returns driver-side codebooks (metadata)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    base = df.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    base = base.cache()

    # r11 (guide §2.6 "overlap independent jobs"): the M per-subspace
    # fits are INDEPENDENT seeded jobs over the same cached frame, but
    # the sequential loop left most of local[32] idle through each fit's
    # straggler tail (KMeans runs ~a dozen small aggregation rounds per
    # fit, each with a sync barrier). Materialize the cache once, then
    # run the fits from a small thread pool so each fit's barriers
    # back-fill the others' idle cores. Bit-identical codebooks: each
    # fit sees the same materialized partitions, same seed, same
    # treeAggregate topology — concurrency changes scheduling, not the
    # arithmetic (pinned by tests/test_pq.py equality vs the index
    # twins).
    def fit_sub(sub: int) -> list[list[float]]:
        sub_df = base.select(
            array_to_vector(F.slice(F.col("_v"), sub * dsub + 1, dsub)).alias(
                "__features"
            )
        )
        model = KMeans(k=ksub, seed=seed + sub, featuresCol="__features").fit(
            sub_df
        )
        return [[float(x) for x in c] for c in model.clusterCenters()]

    try:
        base.count()  # materialize the cache before fanning out the fits
        if m > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
                codebooks = list(pool.map(fit_sub, range(m)))
        else:
            codebooks = [fit_sub(0)]
    finally:
        base.unpersist()
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Compress vectors to M small codes (``array<int>``, values <
    ksub). Vectorized argmin over whole Arrow batches."""
    import numpy as np

    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for sub in range(m):
                chunk = vecs[:, sub * dsub : (sub + 1) * dsub]
                # |x - c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row
                d2 = (
                    -2.0 * chunk @ books[sub].T
                    + (books[sub] ** 2).sum(axis=1)[None, :]
                )
                codes[:, sub] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], code_col: [list(map(int, c)) for c in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode_batches, schema=f"{id_col} long, {code_col} array<int>"
    )


def pq_encode_col(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Column-preserving variant of :func:`pq_encode`: appends ``code_col``
    with a Series-to-Series ``pandas_udf`` instead of projecting the frame
    down to (id, code), so carriers like the IVF ``list_id`` survive without
    a join-back shuffle (the shape the materialized IVF-PQ build needs —
    same pattern as ``ivf.assign_to_centroids``). Same vectorized argmin
    math as ``pq_encode``; a pytest pins code-for-code equality."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    def encode(emb):
        vecs = np.vstack([np.asarray(v, dtype=np.float64) for v in emb])
        codes = np.empty((len(vecs), m), dtype=np.int32)
        for sub in range(m):
            chunk = vecs[:, sub * dsub : (sub + 1) * dsub]
            d2 = (
                -2.0 * chunk @ books[sub].T
                + (books[sub] ** 2).sum(axis=1)[None, :]
            )
            codes[:, sub] = d2.argmin(axis=1)
        return pd.Series([list(map(int, c)) for c in codes])

    encode.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    udf = pandas_udf("array<int>")(encode)
    return df.withColumn(code_col, udf(F.col(vec_col)))


def _adc_table(
    codebooks: list[list[list[float]]], query_vec: list[float]
) -> list[list[float]]:
    """M x ksub exact squared subdistances from the query's subvectors."""
    import numpy as np

    qv = np.asarray(query_vec, dtype=np.float64)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = []
    for sub in range(m):
        diff = np.asarray(codebooks[sub]) - qv[sub * dsub : (sub + 1) * dsub][None, :]
        lut.append([float(x) for x in (diff**2).sum(axis=1)])
    return lut


def adc_dist_col(lut: list[list[float]], code_col: str = "pq_code"):
    """The ADC scoring expression: per-subspace LUT rows embedded as JVM
    literal arrays, indexed by the stored code and summed — pure codegen,
    no Python at scoring time. Shared by ``pq_search`` and the
    materialized IVF-PQ probe so the two paths are bit-identical."""
    dist = None
    for sub, row in enumerate(lut):
        arr = F.array(*[F.lit(x) for x in row])
        term = F.element_at(arr, F.col(code_col)[sub] + 1)
        dist = term if dist is None else dist + term
    return dist


def pq_search(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    refine_with: DataFrame | None = None,
    refine_factor: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the compressed codes. With ``refine_with`` (the
    full-precision table), the approximate top ``k * refine_factor`` are
    exact-cosine re-ranked — the standard PQ recall recovery at the cost
    of fetching only the short list's vectors."""
    lut = _adc_table(codebooks, query_vec)
    dist = adc_dist_col(lut, code_col)
    n = k * refine_factor if refine_with is not None else k
    approx = (
        encoded.select(id_col, dist.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(n)
    )
    if refine_with is None:
        return approx
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        refine_with.join(F.broadcast(approx), id_col)
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), qlit), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


@query("ann_pq_topk", tags=("similarity", "approx", "pq"))
def ann_pq_topk(spark, sf_dir: str) -> DataFrame:
    """PQ-compressed ADC top-10 for vec_id=0 with exact refine (rows-only
    driver check; pytest pins compression shape, determinism, and recall
    on clustered vectors).

    This is the INLINE/didactic form — it trains and encodes per call,
    which is the right shape for a one-off exploration but not for a
    served index. The build-once scale path is the materialized IVF-PQ
    index (``operators/ivfpq.py``: codes stored inside the
    list_id-partitioned table, codebooks in properties, file-pruned
    probe), registered as ``ann_ivfpq_topk_indexed``."""
    from delta_lake_optimizations_spark.catalog import load_table
    from delta_lake_optimizations_spark.operators.similarity import query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    qv = query_vector(spark, sf_dir, 0)
    books = pq_train(emb, m=4, ksub=16, seed=7)
    encoded = pq_encode(emb, books)
    return pq_search(encoded, books, qv, k=10, refine_with=emb, refine_factor=4)
