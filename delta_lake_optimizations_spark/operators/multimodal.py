"""Multimodal column support (SURVEY.md §2.9 X4).

Convention: a multimodal asset is an opaque ``binary`` payload column plus
typed metadata (``mime``, ``n_bytes``, optional ``uri`` for lazy loading —
at 100 TB you store URI + byte-range, not inline blobs). The Spark-side
plumbing (schema, Arrow batching via ``mapInPandas``, partition-preserving
transforms) is real and tested; the actual image/audio codec step is a
clearly marked deterministic stub because no media libraries ship in this
environment (container constraint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_optimizations_spark.catalog import load_table
from delta_lake_optimizations_spark.registry import query

DECODE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, width int, height int, n_pixels bigint"
)


def to_multimodal(
    df: DataFrame, id_col: str, payload_text_col: str, mime: str
) -> DataFrame:
    """Wrap a text column as a multimodal asset row: binary payload + metadata.

    (In production the payload comes from object storage; here we encode
    the text column so the byte plumbing is exercised end-to-end.)
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(payload_text_col), "utf-8").alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(payload_text_col)).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB codec: deterministic fake width/height derived from the payload.

    Replace with a real decoder (PIL / torchaudio / pyav) where available —
    the surrounding Arrow/mapInPandas plumbing is production-shaped.
    """
    if payload is None:
        raise NotImplementedError("real decode requires a media library")
    w = 16 + (payload[0] if len(payload) > 0 else 0) % 64
    h = 16 + (len(payload) % 64)
    return w, h


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' over the binary payload via mapInPandas.

    Batches stream through Python without materializing a partition at
    once; output schema is fixed so downstream plans are stable.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_pixels": [d[0] * d[1] for d in dims],
                }
            )

    return assets.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


@query(
    "multimodal_manifest",
    tags=("multimodal",),
    oracle="""
        SELECT
            doc_id,
            'text/plain' AS mime,
            octet_length(encode(text)) AS n_bytes
        FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset manifest: id + mime + payload size (metadata-only scan shape)."""
    documents = load_table(spark, sf_dir, "documents")
    return to_multimodal(documents, "doc_id", "text", "text/plain").select(
        "doc_id", "mime", "n_bytes"
    )


@query("multimodal_decode_stub", tags=("multimodal", "stub"))
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> fake-decoded dimensions via Arrow-batched
    mapInPandas (rows-only driver check: the codec is a deterministic stub,
    the distributed plumbing is real)."""
    documents = load_table(spark, sf_dir, "documents")
    assets = to_multimodal(documents, "doc_id", "text", "text/plain")
    return decode_assets(assets)
