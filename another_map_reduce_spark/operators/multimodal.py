"""Multimodal column plumbing — [extension].

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed in Arrow batches via ``mapInPandas``.  The
Spark-side plumbing — schema, batching, partition behavior, UDF
signatures — is real and tested; the actual media decoding is stubbed
(this container has no image/audio libraries) behind
``decode_image_stub``: a deterministic fake that derives metadata from
the bytes, clearly marked and swappable for PIL/librosa/ffmpeg.

Scale notes: mapInPandas streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so blob columns
never materialise a whole partition in memory; decode parallelism is
the scan parallelism.  Keep blobs in their own column (parquet stores
them contiguously) and select them only in decode stages so scans of
metadata-only queries never read the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema of extracted metadata. width/height are what a real decoder
# would produce; the stub derives them deterministically from bytes.
IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, width long, height long"
)


def decode_image_stub(blob: bytes) -> tuple[int, int]:
    """STUB — deterministic fake image decode.

    Real implementation would be ``PIL.Image.open(io.BytesIO(blob)).size``;
    that library is unavailable here, so dimensions are derived from the
    payload deterministically (same contract: bytes → (width, height)).
    """
    if blob is None:
        raise NotImplementedError("no payload; real decoder would raise IOError")
    return (len(blob) % 64) + 1, (len(blob) % 32) + 1


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialise an opaque binary column (here: utf-8 of the text —
    the test corpus has no real blobs; production would read them from
    object storage or have them inline in parquet)."""
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def extract_image_metadata(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    One pandas batch in → one metadata batch out; the blob column is
    dropped on output so downstream stages shuffle only metadata.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            blobs = batch[blob_col]
            dims = [decode_image_stub(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col],
                    "n_bytes": [len(b) for b in blobs],
                    "content_md5": [hashlib.md5(b).hexdigest() for b in blobs],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        _extract, schema=IMAGE_META_SCHEMA
    )
