"""Property-based tests (hypothesis): the custom operators with the
subtlest semantics — as-of join and exact NTILE — hold against brute-force
ground truths on randomized inputs, not just hand-picked fixtures.

Example counts are small: every example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_optimizations_spark.operators.asof import asof_join
from delta_lake_optimizations_spark.operators.ranking import ntile_exact

_BASE = dt.datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),          # key
        st.integers(min_value=0, max_value=500),   # minutes offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_events, right=_events, strict=st.booleans())
def test_asof_matches_bruteforce(spark, left, right, strict):
    lrows = [
        (k, _BASE + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left)
    ]
    rrows = [
        (k, _BASE + dt.timedelta(minutes=m), float(i)) for i, (k, m) in enumerate(right)
    ]
    ldf = spark.createDataFrame(
        lrows,
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lid", T.IntegerType()),
        ]),
    )
    rdf = spark.createDataFrame(
        rrows,
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("val", T.DoubleType()),
        ]),
    )
    got = {
        r["lid"]: r["val_asof"]
        for r in asof_join(ldf, rdf, "k", "ts", "rts", strict=strict).collect()
    }

    def naive(lk, lt):
        best = None
        for rk, rt, v in rrows:
            if rk != lk:
                continue
            ok = rt < lt if strict else rt <= lt
            # ties on rt: the window picks the LAST right row in
            # (time, input) order -> max value wins ties deterministically
            if ok and (best is None or rt > best[0] or (rt == best[0])):
                if best is None or rt > best[0]:
                    best = (rt, v)
                else:
                    best = (rt, max(best[1], v))
        return best[1] if best else None

    for lk, lt, lid in lrows:
        want = naive(lk, lt)
        g = got[lid]
        if want is None:
            assert g is None
        else:
            # equal-timestamp right rows are an arbitrary-but-valid pick
            candidates = {
                v for rk, rt, v in rrows
                if rk == lk and rt == max(
                    rt2 for rk2, rt2, _ in rrows
                    if rk2 == lk and (rt2 < lt if strict else rt2 <= lt)
                )
            }
            assert g in candidates


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_rows=st.integers(min_value=1, max_value=200),
    k=st.integers(min_value=1, max_value=12),
)
def test_ntile_matches_window(spark, n_rows, k):
    df = spark.range(n_rows).select(
        (F.col("id") * 37 % 101).alias("v"), F.col("id")
    )
    got = {
        r["id"]: r["b"]
        for r in ntile_exact(df, k, ["v", "id"], bucket_col="b", num_partitions=4).collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(k).over(W.orderBy("v", "id"))).collect()
    }
    assert got == want


_keysets = st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=15, unique=True)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(target_keys=_keysets, source_keys=_keysets)
def test_merge_upsert_semantics(spark, tmp_path_factory, target_keys, source_keys):
    """Random key sets: post-merge table == (target rows, updated where
    matched) + (source rows whose key is new)."""
    from delta_lake_optimizations_spark.table import GraftTable
    from delta_lake_optimizations_spark.table.merge import merge

    root = tmp_path_factory.mktemp("merge_prop")
    tdf = spark.createDataFrame(
        [(k, float(k)) for k in target_keys], "k long, v double"
    ).repartition(2)
    sdf = spark.createDataFrame(
        [(k, float(k) + 1000.0) for k in source_keys], "k long, v double"
    )
    t = GraftTable(spark, str(root / "t"))
    t.write(tdf)
    merge(t, sdf, on=["k"], when_matched_update="*", when_not_matched_insert="*")

    got = {r["k"]: r["v"] for r in t.load().collect()}
    want = {k: float(k) for k in target_keys}
    want.update({k: float(k) + 1000.0 for k in source_keys})
    assert got == want


_texts = st.lists(
    st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=1200),
    min_size=1,
    max_size=5,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_texts, st.integers(2, 40), st.integers(1, 39))
def test_chunk_windows_reconstructs_documents(spark, texts, size, stride_raw):
    from delta_lake_optimizations_spark.operators.textstats import chunk_windows

    stride = min(stride_raw, size)  # overlap >= 0
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = chunk_windows(df, "doc_id", "text", size=size, stride=stride, include_text=True)
    by_doc: dict[int, list] = {}
    for r in got.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in rows:
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_start"])
        if len(t) == 0:
            assert not chunks
            continue
        # starts tile the text at exactly `stride`; stitching the first
        # `stride` chars of each chunk plus the final chunk's tail
        # reconstructs the document byte-for-byte
        assert [c["chunk_start"] for c in chunks] == list(range(0, len(t), stride))
        rebuilt = "".join(c["chunk_text"][:stride] for c in chunks[:-1]) + chunks[-1]["chunk_text"]
        assert rebuilt == t
        assert all(c["chunk_len"] == len(c["chunk_text"]) for c in chunks)


_rw_rows = st.lists(
    st.integers(min_value=0, max_value=60), min_size=1, max_size=30, unique=True
)
_rw_new = st.lists(
    st.integers(min_value=0, max_value=60), min_size=0, max_size=10, unique=True
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=_rw_rows, lo=st.integers(0, 50), span=st.integers(1, 20), new=_rw_new)
def test_replace_where_set_semantics(spark, tmp_path_factory, keys, lo, span, new):
    """replaceWhere == (old rows NOT matching predicate) ∪ incoming, for
    arbitrary key sets and ranges — file layout independent."""
    import os as _os

    from delta_lake_optimizations_spark.table import GraftTable

    hi = lo + span
    new_in_range = [k for k in new if lo <= k < hi]
    root = str(tmp_path_factory.mktemp("rw"))
    t = GraftTable(spark, _os.path.join(root, "t"))
    t.write(
        spark.createDataFrame([(k,) for k in keys], "k long").repartition(3)
    )
    t.write(
        spark.createDataFrame([(k,) for k in new_in_range] or [], "k long"),
        replace_where=[("k", ">=", lo), ("k", "<", hi)],
    )
    got = sorted(r["k"] for r in t.load().collect())
    expect = sorted([k for k in keys if not (lo <= k < hi)] + new_in_range)
    assert got == expect


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=4),
    parts=st.integers(min_value=1, max_value=5),
)
def test_identity_unique_across_appends(spark, tmp_path_factory, sizes, parts):
    """Identity values stay globally unique and monotonic-per-write across
    arbitrary append sizes and partitioning."""
    import os as _os

    from delta_lake_optimizations_spark.table import GraftTable

    root = str(tmp_path_factory.mktemp("idp"))
    t = GraftTable(spark, _os.path.join(root, "t"))
    total = 0
    for i, n in enumerate(sizes):
        df = spark.range(n).selectExpr("id AS payload").repartition(parts)
        t.write(
            df,
            mode="append" if i else "overwrite",
            properties=None if i else {"graft.identity.id": "start=1,step=1"},
        )
        total += n
    ids = [r["id"] for r in t.load().select("id").collect()]
    assert len(ids) == total
    assert len(set(ids)) == total, "identity collision"


# ---------------------------------------------------------------------------
# Cross-PROCESS optimistic concurrency (VERDICT r04 #7): the in-process race
# tests simulate the loser; here real OS processes race the link(2) commit
# protocol against the same table directory.
# ---------------------------------------------------------------------------


def _race_remove_worker(args):
    """Attempt a NON-rebaseable commit (remove list) at a fixed stale
    base_version. Exactly one process across the pool may win."""
    path, base_version, worker_id = args
    import sys

    sys.path.insert(0, "/root/repo")
    from delta_lake_optimizations_spark.table.graft_table import (
        ConcurrentCommitError,
        GraftTable,
    )

    t = GraftTable(None, path)  # commit protocol is pure file IO — no Spark
    try:
        t._write_commit(
            f"RACE REMOVE {worker_id}",
            {"worker": worker_id},
            [],
            ["data/nonexistent.parquet"],  # non-empty remove => never rebases
            base_version=base_version,
        )
        return ("win", worker_id)
    except ConcurrentCommitError:
        return ("lose", worker_id)


def _race_append_worker(args):
    """Blind append (add-only) from a stale base_version: must ALWAYS
    succeed by rebasing onto the current head."""
    path, base_version, worker_id = args
    import sys

    sys.path.insert(0, "/root/repo")
    from delta_lake_optimizations_spark.table.graft_table import AddFile, GraftTable

    t = GraftTable(None, path)
    c = t._write_commit(
        f"RACE APPEND {worker_id}",
        {"worker": worker_id},
        [AddFile(path=f"data/race-{worker_id}.parquet", size=1, num_records=1)],
        [],
        base_version=base_version,
    )
    return ("win", c.version)


def test_cross_process_commit_race_single_winner(spark, tmp_path_factory):
    """Eight OS processes race a conflicting (non-rebaseable) commit at the
    same stale version: the link(2) protocol must admit EXACTLY one."""
    import multiprocessing as mp
    import os

    from delta_lake_optimizations_spark.table import GraftTable

    path = str(tmp_path_factory.mktemp("xproc") / "t")
    t = GraftTable(spark, path)
    t.write(spark.range(10).toDF("id"))
    base = t.latest_version()

    ctx = mp.get_context("fork")
    with ctx.Pool(8) as pool:
        results = pool.map(
            _race_remove_worker, [(path, base, i) for i in range(8)]
        )
    wins = [r for r in results if r[0] == "win"]
    assert len(wins) == 1, f"expected exactly one winner, got {results}"
    # log consistency: contiguous versions, single commit file per version
    assert t.latest_version() == base + 1
    log_files = sorted(
        f for f in os.listdir(os.path.join(path, "_log")) if f.endswith(".json")
    )
    assert len(log_files) == len(set(log_files)) == base + 2


def test_cross_process_blind_appends_all_land(spark, tmp_path_factory):
    """Eight OS processes blind-append from the same stale snapshot: every
    one must land (rebase-and-retry), on eight DISTINCT versions."""
    import multiprocessing as mp

    from delta_lake_optimizations_spark.table import GraftTable

    path = str(tmp_path_factory.mktemp("xproc2") / "t")
    t = GraftTable(spark, path)
    t.write(spark.range(10).toDF("id"))
    base = t.latest_version()

    ctx = mp.get_context("fork")
    with ctx.Pool(8) as pool:
        results = pool.map(
            _race_append_worker, [(path, base, i) for i in range(8)]
        )
    assert all(r[0] == "win" for r in results)
    versions = sorted(r[1] for r in results)
    assert versions == list(range(base + 1, base + 9)), versions
    # every appended file is visible in the final snapshot
    snap_paths = {f.path for f in t.snapshot().files}
    for i in range(8):
        assert f"data/race-{i}.parquet" in snap_paths


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t\n xyz.,!"), max_size=40
        ),
        min_size=1,
        max_size=12,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_gram_rows_equal_token_ngrams_property(spark, texts, n):
    """Property pin for the codegen gram generator: for ARBITRARY texts
    (unicode whitespace, punctuation, empties) the distinct gram set per
    doc equals the token_ngrams reference."""
    from pyspark.sql import functions as F

    from delta_lake_optimizations_spark.operators.dedup import (
        _gram_rows,
        token_ngrams,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ref = {
        tuple(r)
        for r in df.select(
            F.col("doc_id").alias("_id"),
            F.explode(token_ngrams(F.col("text"), n)).alias("_gram"),
        ).collect()
    }
    got = {tuple(r) for r in _gram_rows(df, "doc_id", "text", n).collect()}
    assert got == ref
