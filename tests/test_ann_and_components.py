"""IVF ANN recall tests + connected-components correctness vs a Python
union-find ground truth on the collected edge list (small at test SF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.operators.components import (
    connected_components,
    dedup_assign_clusters,
)
from delta_lake_optimizations_spark.operators.dedup import minhash_lsh_pairs
from delta_lake_optimizations_spark.operators.ivf import ivf_build, ivf_search
from delta_lake_optimizations_spark.operators.similarity import query_vector, topk_cosine

from .conftest import SF_DIR


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qv = query_vector(spark, SF_DIR, 0)
    exact = {r["vec_id"] for r in topk_cosine(emb, qv, k=10).collect()}

    assigned, centroids = ivf_build(emb, nlist=8, seed=7)
    got = {r["vec_id"] for r in ivf_search(assigned, centroids, qv, k=10, nprobe=4).collect()}
    # probing half the cells must recover most of the exact top-10
    assert len(got & exact) >= 7
    # full probe == exact
    got_all = {
        r["vec_id"]
        for r in ivf_search(assigned, centroids, qv, k=10, nprobe=8).collect()
    }
    assert got_all == exact


def test_ivf_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    _, c1 = ivf_build(emb, nlist=4, seed=7)
    _, c2 = ivf_build(emb, nlist=4, seed=7)
    assert c1 == c2


def _union_find_ground_truth(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


def test_connected_components_matches_union_find(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edge_list, "corpus should contain near-dups"

    want = _union_find_ground_truth(edge_list)
    got = {
        r["vertex"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == want


def test_dedup_assign_clusters_keep_one(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    clustered = dedup_assign_clusters(docs, pairs)
    n_docs = docs.count()
    n_clusters = clustered.select("cluster_id").distinct().count()
    n_dupes = pairs.select("doc_a").union(pairs.select("doc_b")).distinct().count()
    assert n_clusters < n_docs  # something merged
    kept = clustered.filter(F.col("doc_id") == F.col("cluster_id"))
    assert kept.count() == n_clusters
    # every row maps to a representative no larger than itself
    assert clustered.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0
    assert n_docs - n_clusters <= n_dupes
