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


def cap_group_share(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_fraction: float,
    order_by: Column | None = None,
) -> DataFrame:
    """Per-group quota capping (the CCNet/C4 'no domain dominates' rule):
    within each group keep at most ``max_fraction`` of that group's rows,
    preferring ``order_by`` (e.g. a quality score, descending) and
    breaking ties by hashed key so the cut is deterministic.

    One shuffle on the group key; the per-group count comes from a
    window ``count(*)`` over the same partition — no second pass, no
    driver-side counts. At 100 TB a skewed domain (one host = 30% of the
    crawl) is exactly what this bounds."""
    h = _hash_hex(F.col(key_col))
    order = [order_by, h.asc()] if order_by is not None else [h.asc()]
    w = Window.partitionBy(group_col).orderBy(*order, F.col(key_col).asc())
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") <= F.greatest(
            F.lit(1), F.floor(F.col("_n") * F.lit(max_fraction))
        ))
        .drop("_rn", "_n")
    )


def mixture_rebalance(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_weights: dict[str, float],
) -> DataFrame:
    """Downsample groups so the surviving corpus matches
    ``target_weights`` exactly (no upsampling): scale
    ``C = min_g(n_g / w_g)`` is the largest corpus size every group can
    serve, and each group keeps its ``floor(C * w_g)`` best-hash-ranked
    rows. Groups not in the weights are dropped.

    Per-group counts are a tiny aggregate (one row per group — metadata,
    not data) broadcast back against the hash-ranked frame: two narrow
    shuffles on the group key total, deterministic across cluster sizes."""
    weights = {k: float(v) for k, v in target_weights.items()}
    total = sum(weights.values())
    weights = {k: v / total for k, v in weights.items()}
    in_scope = df.filter(F.col(group_col).isin(*weights))
    counts = {
        r["g"]: r["n"]
        for r in in_scope.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return in_scope
    scale = min(counts[g] / w for g, w in weights.items() if g in counts)
    quotas = {g: int(scale * w) for g, w in weights.items() if g in counts}
    h = _hash_hex(F.col(key_col))
    w_rank = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    quota_expr = F.create_map(
        *[x for g, q in sorted(quotas.items()) for x in (F.lit(g), F.lit(q))]
    )
    return (
        in_scope.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= quota_expr[F.col(group_col)])
        .drop("_rn")
    )


_MIX_WEIGHTS = {"en": 0.5, "es": 0.2, "fr": 0.2, "de": 0.05, "zh": 0.05}


@query(
    "cap_source_share",
    tags=("sampling", "curation"),
    oracle="""
        SELECT doc_id, source
        FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC,
                                md5(CAST(doc_id AS VARCHAR)) ASC,
                                doc_id ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM documents
        ) t
        WHERE rn <= GREATEST(1, FLOOR(n * 0.30))
    """,
)
def cap_source_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most 30% of each source's documents, preferring longer
    documents (n_chars as the stand-in quality signal)."""
    documents = load_table(spark, sf_dir, "documents")
    return cap_group_share(
        documents, "source", "doc_id", 0.30, order_by=F.col("n_chars").desc()
    ).select("doc_id", "source")


@query(
    "mixture_rebalance_langs",
    tags=("sampling", "curation"),
    oracle=f"""
        WITH in_scope AS (
            SELECT doc_id, lang FROM documents
            WHERE lang IN ('en','es','fr','de','zh')
        ),
        counts AS (
            SELECT lang AS g, COUNT(*) AS n FROM in_scope GROUP BY lang
        ),
        weights(g, w) AS (VALUES
            ('en', 0.5), ('es', 0.2), ('fr', 0.2), ('de', 0.05), ('zh', 0.05)
        ),
        scale AS (
            SELECT MIN(n / w) AS c FROM counts JOIN weights USING (g)
        ),
        quotas AS (
            -- FLOOR, not a bare BIGINT cast: DuckDB's cast rounds, while
            -- the Spark-side quota uses Python int() truncation
            SELECT g, CAST(FLOOR(c * w) AS BIGINT) AS q
            FROM weights CROSS JOIN scale JOIN counts USING (g)
        )
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM in_scope
        ) t JOIN quotas ON t.lang = quotas.g
        WHERE rn <= q
    """,
)
def mixture_rebalance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a 50/20/20/5/5 en/es/fr/de/zh training
    mixture by deterministic downsampling."""
    documents = load_table(spark, sf_dir, "documents")
    return mixture_rebalance(documents, "lang", "doc_id", _MIX_WEIGHTS).select(
        "doc_id", "lang"
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


def weighted_sample_bernoulli(
    df: DataFrame,
    weight_col: str,
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling: row i is kept
    iff ``u(i) < fraction * w_i / mean(w)`` where ``u(i)`` is the md5-hash
    uniform of its id. Expected sample size ≈ ``fraction * n``; inclusion
    probability ∝ weight (clipped at 1) — the importance-sampling
    primitive behind length-balanced corpus draws.

    Determinism and ENGINE-portability: u(i) comes from the first 8 md5
    hex digits (exact integer), and the per-row threshold uses only
    IEEE *,/ plus a 6-dp round — no transcendentals, no RNG state — so
    Spark and DuckDB select byte-identical row sets and the driver can
    hash-compare them. One tiny mean aggregation broadcast to the scan;
    everything else is map-only.
    """
    mean_w = df.agg(F.avg(F.col(weight_col).cast("double")).alias("__mw"))
    u = (
        F.conv(F.substring(_hash_hex(F.col(id_col)), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )
    p = F.round(
        F.lit(fraction) * F.col(weight_col).cast("double") / F.col("__mw"), 6
    )
    return (
        df.crossJoin(F.broadcast(mean_w))
        .filter(u < p)
        .drop("__mw")
    )


@query(
    "weighted_sample_by_length",
    tags=("sampling", "weighted", "llm-pipeline"),
    oracle="""
        WITH m AS (SELECT AVG(CAST(n_chars AS DOUBLE)) AS mw FROM documents)
        SELECT doc_id, n_chars
        FROM documents, m
        WHERE CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  / 4294967296.0
              < ROUND(0.2 * CAST(n_chars AS DOUBLE) / mw, 6)
    """,
)
def weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~20% corpus draw with inclusion probability proportional to
    document length — longer documents (more tokens) are proportionally
    more likely to be kept, the standard token-budget-aware sampling."""
    documents = load_table(spark, sf_dir, "documents")
    return weighted_sample_bernoulli(documents, "n_chars", 0.2, "doc_id").select(
        "doc_id", "n_chars"
    )


def temperature_rebalance(
    df: DataFrame,
    group_col: str,
    key_col: str,
    temperature: float,
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual-LM recipe:
    target share ∝ empirical_share^(1/T)). T=1 keeps the corpus as-is,
    T→∞ flattens toward uniform across groups — boosting low-resource
    groups' RELATIVE share without upsampling (downsample-only, like
    :func:`mixture_rebalance`, which this composes: the per-group counts
    are one tiny collect, the realized quotas the same deterministic
    best-hash-ranked keep)."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return df
    total = sum(counts.values())
    powered = {g: (n / total) ** (1.0 / temperature) for g, n in counts.items()}
    z = sum(powered.values())
    weights = {g: p / z for g, p in powered.items()}
    return mixture_rebalance(df, group_col, key_col, weights)


@query(
    "temperature_rebalance_langs",
    tags=("sampling", "curation", "llm-pipeline"),
    oracle="""
        WITH counts AS (
            SELECT lang AS g, COUNT(*) AS n FROM documents GROUP BY lang
        ),
        tot AS (SELECT SUM(n) AS t FROM counts),
        weights AS (
            SELECT g, POWER(n / t, 0.5)
                      / SUM(POWER(n / t, 0.5)) OVER () AS w
            FROM counts CROSS JOIN tot
        ),
        scale AS (
            SELECT MIN(n / w) AS c FROM counts JOIN weights USING (g)
        ),
        quotas AS (
            SELECT g, CAST(FLOOR(c * w) AS BIGINT) AS q
            FROM weights CROSS JOIN scale
        )
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM documents
        ) t JOIN quotas ON t.lang = quotas.g
        WHERE rn <= q
    """,
)
def temperature_rebalance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=2 temperature mixture over languages: low-resource languages'
    relative share rises toward uniform, realized by deterministic
    downsampling."""
    documents = load_table(spark, sf_dir, "documents")
    return temperature_rebalance(documents, "lang", "doc_id", 2.0).select(
        "doc_id", "lang"
    )
