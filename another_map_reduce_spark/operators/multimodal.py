"""Multimodal column plumbing — [extension].

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed in Arrow batches via ``mapInPandas``.  The
Spark-side plumbing — schema, batching, partition behavior, UDF
signatures — is real and tested; media decoding probes for PIL at
import time (``decode_image``) and uses it when both the library and a
decodable payload are present, falling back to ``decode_image_stub``:
a deterministic fake that derives metadata from the bytes, clearly
marked and swappable for librosa/ffmpeg on the audio/video side.

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


def _probe_pil():
    """Import PIL if this environment has it.  Runs once per process —
    on executors the probe re-runs when the shipped package is first
    imported, so a heterogeneous cluster uses PIL exactly where it
    exists."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


_PIL_IMAGE = _probe_pil()


def decode_image_stub(blob: bytes) -> tuple[int, int]:
    """STUB — deterministic fake image decode.

    Fallback when PIL is unavailable (this container) or the payload
    isn't a decodable image (the test corpus stores utf-8 text in the
    binary column): dimensions are derived from the payload
    deterministically (same contract: bytes → (width, height)), which
    is also what the DuckDB oracle replays.
    """
    if blob is None:
        raise NotImplementedError("no payload; real decoder would raise IOError")
    return (len(blob) % 64) + 1, (len(blob) % 32) + 1


def decode_image(blob: bytes) -> tuple[int, int]:
    """Real-when-possible image decode: PIL's ``Image.open(...).size``
    if the library is importable AND the bytes parse as an image;
    otherwise the deterministic stub.  The oracle-checked queries stay
    consistent either way because the test corpus's payloads are utf-8
    text that no real decoder accepts — PIL environments fall back to
    the stub for them too."""
    if blob is None:
        raise NotImplementedError("no payload; real decoder would raise IOError")
    if _PIL_IMAGE is not None:
        import io

        try:
            with _PIL_IMAGE.open(io.BytesIO(bytes(blob))) as im:
                return int(im.size[0]), int(im.size[1])
        except Exception:
            pass  # undecodable payload → deterministic fallback
    return decode_image_stub(blob)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialise an opaque binary column (here: utf-8 of the text —
    the test corpus has no real blobs; production would read them from
    object storage or have them inline in parquet)."""
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def extract_image_metadata(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    decoder=None,
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    One pandas batch in → one metadata batch out; the blob column is
    dropped on output so downstream stages shuffle only metadata.

    ``decoder`` defaults to :func:`decode_image` (real decode when PIL
    exists, stub otherwise).  Pass :func:`decode_image_stub` when the
    output must be engine-independent regardless of installed libs —
    e.g. the oracle-checked ``multimodal_meta`` query, whose DuckDB
    side replays the stub formula and would diverge on any payload a
    real decoder happens to accept (ASCII formats like Netpbm/XBM).
    """
    decode = decoder or decode_image

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            blobs = batch[blob_col]
            dims = [decode(b) for b in blobs]
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


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_bytes long, frame_fp string"


def sample_frames(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    frame_size: int = 128,
    stride: int = 1,
) -> DataFrame:
    """Frame sampling over a binary column: split each blob into
    fixed-size frames and keep every ``stride``-th one — the video
    keyframe-extraction shape (1 blob row → N frame rows).

    Real decoders would demux containers and decode frames; the
    container has no media libs, so a "frame" is a byte window and the
    per-frame payload stands in for decoded pixels.  The EXPLODE
    plumbing is the real thing: Arrow batches stream in via
    mapInPandas, each input row yields its frame rows into the same
    output batch, and only (id, idx, size, fingerprint) leave the
    stage — raw frame bytes never shuffle.

    The fingerprint is md5 over the frame's UPPERCASE HEX encoding
    (not the raw bytes) so engines without blob slicing (the DuckDB
    oracle) can replay it exactly from ``hex(encode(text))``.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            fps: list[str] = []
            for doc_id, blob in zip(batch[id_col], batch[blob_col]):
                b = bytes(blob)
                n_frames = -(-len(b) // frame_size) if b else 0
                for i in range(0, n_frames, stride):
                    frame = b[i * frame_size : (i + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
                    fps.append(
                        hashlib.md5(frame.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "frame_fp": fps,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(_frames, schema=FRAME_SCHEMA)
