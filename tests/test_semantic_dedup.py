"""SemDeDup semantic dedup: planted near-duplicates are pruned, distinct
content survives, the keep-rule is deterministic, and recall vs an exact
all-pairs pruner is high on clustered data."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row

from delta_lake_optimizations_spark.operators.semantic_dedup import (
    semantic_dedup,
    semantic_dedup_pairs,
)

DIM = 16


def _clustered_corpus(n_centers=6, per_center=12, dup_fraction=0.5, seed=3):
    """Well-separated unit centers, tight points around them, and planted
    near-exact duplicates (tiny jitter) of a fraction of the points."""
    rng = random.Random(seed)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    centers = []
    for _ in range(n_centers):
        centers.append(unit([rng.gauss(0, 1) for _ in range(DIM)]))
    rows, next_id = [], 0
    originals = []
    for c in centers:
        for _ in range(per_center):
            v = unit([x + rng.gauss(0, 0.12) for x in c])
            rows.append(Row(vec_id=next_id, embedding=v))
            originals.append((next_id, v))
            next_id += 1
    planted = []  # (original_id, dup_id)
    for oid, v in originals:
        if rng.random() < dup_fraction:
            dup = unit([x + rng.gauss(0, 0.004) for x in v])
            rows.append(Row(vec_id=next_id, embedding=dup))
            planted.append((oid, next_id))
            next_id += 1
    return rows, planted


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_planted_duplicates_pruned_originals_kept(spark):
    rows, planted = _clustered_corpus()
    df = spark.createDataFrame(rows)
    kept = {r.vec_id for r in semantic_dedup(df, threshold=0.999, nlist=6).collect()}
    assert planted, "corpus must plant duplicates"
    for oid, did in planted:
        # lowest-id-wins: the original survives, the jittered copy goes
        assert oid in kept
        assert did not in kept


def test_matches_exact_allpairs_pruner(spark):
    """Cluster-blocked pruning should remove (nearly) the same set as an
    exact corpus-wide all-pairs pruner at the same threshold."""
    rows, _ = _clustered_corpus()
    df = spark.createDataFrame(rows)
    kept = {r.vec_id for r in semantic_dedup(df, threshold=0.999, nlist=6).collect()}

    vecs = {r.vec_id: list(r.embedding) for r in rows}
    exact_losers = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _cos(vecs[a], vecs[b]) >= 0.999:
                exact_losers.add(b)
    exact_kept = set(ids) - exact_losers
    # near-exact duplicates land in the same k-means cell, so the blocked
    # pruner should agree with the exact one on >= 95% of decisions
    agree = len(kept & exact_kept) + len((set(ids) - kept) & exact_losers)
    assert agree / len(ids) >= 0.95, f"agreement={agree / len(ids):.3f}"


def test_deterministic_across_runs(spark):
    rows, _ = _clustered_corpus(seed=11)
    df = spark.createDataFrame(rows).repartition(8)
    a = sorted(r.vec_id for r in semantic_dedup(df, threshold=0.99, nlist=5).collect())
    b = sorted(r.vec_id for r in semantic_dedup(df.repartition(3), threshold=0.99, nlist=5).collect())
    assert a == b


def test_pairs_frame_supports_threshold_sweep(spark):
    rows, planted = _clustered_corpus()
    df = spark.createDataFrame(rows)
    pairs = semantic_dedup_pairs(df, threshold=0.9, nlist=6).cache()
    strict = pairs.filter("cos_sim >= 0.999").count()
    loose = pairs.count()
    assert strict >= len(planted) * 0.9
    assert loose >= strict
    pairs.unpersist()
