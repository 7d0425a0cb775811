"""Incremental exact dedup against a persisted fingerprint store
(SURVEY §2.9 X1/X2 extension — the INGEST-time shape of dedup).

``dedup_exact_text`` dedups a corpus in one pass; real pipelines instead
receive the corpus in batches (a crawl a day) and must drop documents
whose content was already admitted by ANY earlier batch — unbounded
history, so the streaming watermark-bounded dedup
(``streaming/events_stream.py``) does not apply. The classic design is a
*fingerprint store*: a table of content hashes that grows with the
corpus, each new batch anti-joined against it and the survivors'
fingerprints appended transactionally.

Spark-first shape, per batch:

- fingerprint = ``sha2(text, 256)`` — row-local projection;
- intra-batch winners: one window over fp (lowest id survives — same
  rule as ``dedup_exact_text``);
- cross-history: ``left_anti`` equi-join against the store on fp — ONE
  hash shuffle of the (small) batch against the store; Spark picks
  broadcast automatically while the batch is small;
- append ``(fp, id, batch)`` to the store through the GraftTable commit
  log. The batch id is recorded in the commit's operationParameters, so
  a REPLAYED batch (pipeline retry, at-least-once upstream) is detected
  and returns the original run's survivors straight from the store —
  the same exactly-once recipe the streaming sinks use
  (``streaming/graft_sink.py::GraftStreamWriter``).

100 TB notes: the store is clustered by fp (``graft.cluster.by``) so
OPTIMIZE keeps per-file fp ranges tight — the anti-join's store-side
scan prunes nothing (hashes are uniform by design) but point
``contains`` probes ride min/max + bloom skipping; the per-batch cost is
one shuffle of the BATCH, never a rewrite of the store.

Concurrency: an ingest's append is SERIALIZABLE (``write(...,
serializable=True)``) — its survivor set was anti-joined against the
snapshot it read, so if ANY commit lands in between, the commit raises
instead of blind-rebasing and the ingest re-derives against the new
head (re-checking the replay ledger first, which also de-races two
processes retrying the SAME batch id). Two simultaneous batches that
both contain a brand-new fingerprint therefore admit it exactly once:
the loser's retry sees the winner's fps and drops its copy. This is
Delta's WriteSerializable-vs-Serializable distinction, applied to the
one table where append CONTENT depends on the snapshot read
(tests/test_incremental_dedup.py runs the real two-process race).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query
from delta_lake_optimizations_spark.table import GraftTable


class FingerprintStore:
    """Persistent content-hash store backing incremental exact dedup."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = GraftTable(spark, path)

    def ingested_batches(self) -> set[str]:
        if not self.table.exists():
            return set()
        out = set()
        for c in self.table.commits():
            b = c.operation_parameters.get("dedupBatchId")
            if b is not None:
                out.add(str(b))
        return out

    def fingerprints(self) -> DataFrame:
        """All admitted fingerprints (fp, id, batch)."""
        return self.table.load()

    def contains(self, fps: list[str]) -> DataFrame:
        """Point membership probe: rides min/max (+ bloom, if built) file
        skipping on the clustered fp column."""
        return self.table.load(skip_where=[("fp", "in", list(fps))]).filter(
            F.col("fp").isin(*fps)
        )

    def ingest(
        self,
        batch: DataFrame,
        batch_id: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Dedup ``batch`` against itself and all prior batches; append
        the survivors' fingerprints; return the surviving rows of
        ``batch``. Replaying an already-ingested ``batch_id`` performs NO
        new commit and returns the original survivors (read back from
        the store), so retries are exactly-once.

        The append is SERIALIZABLE: if any commit (another batch, the
        same batch from a racing process, an OPTIMIZE) lands between the
        snapshot this ingest read and its own commit, the write raises
        and the whole derivation re-runs against the new head — so a
        fingerprint first seen by two concurrent batches is admitted by
        exactly one of them (module docstring, "Concurrency")."""
        from delta_lake_optimizations_spark.table.graft_table import (
            ConcurrentCommitError,
        )

        batch_id = str(batch_id)
        fp = F.sha2(F.col(text_col).cast("string"), 256)
        fingerprinted = batch.withColumn("fp", fp)

        attempts = 0
        while True:
            if batch_id in self.ingested_batches():
                prior = self.fingerprints().filter(F.col("batch") == batch_id)
                return (
                    fingerprinted.join(
                        prior.select("fp", F.col("id").alias(id_col)),
                        on=["fp", id_col],
                        how="left_semi",
                    )
                    .drop("fp")
                )

            w = Window.partitionBy("fp").orderBy(id_col)
            intra = (
                fingerprinted.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            existed = self.table.exists()
            if existed:
                # pin the version this attempt derives from; the write
                # below carries it as expected_version, so ANY commit that
                # lands between this read and our own commit — before
                # write() starts (up-front head check) or after (link(2)
                # with rebasing disabled) — raises and we re-derive
                ver = self.table.latest_version()
                survivors = intra.join(
                    self.table.load(version=ver).select("fp"),
                    on="fp",
                    how="left_anti",
                )
            else:
                ver = None
                survivors = intra

            to_append = survivors.select(
                "fp",
                F.col(id_col).cast("long").alias("id"),
                F.lit(batch_id).alias("batch"),
            )
            try:
                # mode='error' when the store did not exist at derivation
                # time: if a RIVAL process created it between our exists()
                # check and this write, write() re-checks existence and
                # raises FileExistsError instead of overwriting (which
                # would silently delete the rival's admitted fingerprints
                # — the double-admit hole would re-open through creation).
                # Treated exactly like ConcurrentCommitError below: loop
                # and re-derive with an anti-join against the rival's
                # head. Two creations racing write() itself collide on
                # link(2) at version 0 (creation commits carry metadata,
                # so the loser is never rebased) and raise
                # ConcurrentCommitError — same retry path.
                self.table.write(
                    to_append,
                    mode="append" if existed else "error",
                    # fp is a uniform hash, so min/max ranges can never
                    # prune it; point `contains` probes prune through the
                    # BLOOM sidecar (auto-built at write), and cluster.by
                    # keeps OPTIMIZE re-clustering equality buckets
                    # together.
                    properties=None
                    if existed
                    else {"graft.cluster.by": "fp", "graft.bloom.columns": "fp"},
                    extra_parameters={"dedupBatchId": batch_id},
                    serializable=True,
                    expected_version=ver,
                )
            except (ConcurrentCommitError, FileExistsError):
                attempts += 1
                if attempts > 20:
                    raise
                continue
            return survivors.drop("fp")


@query(
    "incremental_dedup_two_batches",
    tags=("dedup", "incremental"),
    oracle="""
        SELECT doc_id, batch
        FROM (
            SELECT doc_id, batch,
                   ROW_NUMBER() OVER (
                       PARTITION BY md5(CAST(text AS VARCHAR))
                       ORDER BY pri, doc_id
                   ) AS rn
            FROM (
                SELECT doc_id, text, 0 AS pri, 'b0' AS batch
                FROM documents WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, text, 1 AS pri, 'b1' AS batch
                FROM documents WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id + 1000000, text, 1 AS pri, 'b1' AS batch
                FROM documents WHERE doc_id % 2 = 0
            )
        )
        WHERE rn = 1
    """,
)
def incremental_dedup_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end incremental ingest through a fresh FingerprintStore:
    batch b0 = the even-doc_id docs; batch b1 = the odd docs PLUS a
    re-keyed copy of every even doc (same text, doc_id + 1_000_000) —
    genuine cross-batch content duplicates. The provable answer is the
    rows whose content hash is FIRST seen in (batch, doc_id) order, and
    the oracle states exactly that as one window ordered by (batch
    priority, doc_id) grouping on its own md5 — only hash EQUALITY
    matters, so the oracle's hash need not match Spark's sha2, and the
    form stays correct on corpora that already contain duplicate texts
    (the replica-shifted sf1 corpus does). A store that forgets history
    re-admits the copies (rows_match fails); one that over-drops loses
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    store = FingerprintStore(spark, tempfile.mkdtemp(prefix="graft_fpstore_"))
    even = docs.filter(F.col("doc_id") % 2 == 0)
    dup_of_even = even.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    b1 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(dup_of_even)
    out = None
    for bid, batch in (("b0", even), ("b1", b1)):
        kept = store.ingest(batch, bid).select(
            "doc_id", F.lit(bid).alias("batch")
        )
        out = kept if out is None else out.unionByName(kept)
    return out
