"""Multimodal binary-column plumbing tests (decode is a marked stub)."""

from __future__ import annotations

import hashlib

import pytest

from another_map_reduce_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_image_metadata,
)


def test_stub_contract():
    w, h = decode_image_stub(b"\x89PNG fake bytes")
    assert 1 <= w <= 64 and 1 <= h <= 32
    with pytest.raises(NotImplementedError):
        decode_image_stub(None)


def test_decode_image_fallback_without_pil():
    """No PIL in this container → decode_image ≡ the deterministic stub."""
    from another_map_reduce_spark.operators import multimodal as mm

    blob = b"not an image"
    assert mm.decode_image(blob) == decode_image_stub(blob)
    with pytest.raises(NotImplementedError):
        mm.decode_image(None)


def test_decode_image_uses_pil_when_present(monkeypatch):
    """With a PIL-shaped module present, decode_image returns its real
    dimensions for decodable payloads and still falls back to the stub
    for undecodable ones."""
    from another_map_reduce_spark.operators import multimodal as mm

    class _FakeIm:
        size = (640, 480)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImageMod:
        @staticmethod
        def open(fp):
            if fp.read(4) == b"GOOD":
                return _FakeIm()
            raise OSError("cannot identify image file")

    monkeypatch.setattr(mm, "_PIL_IMAGE", _FakeImageMod)
    assert mm.decode_image(b"GOOD...rest") == (640, 480)
    bad = b"not decodable"
    assert mm.decode_image(bad) == decode_image_stub(bad)


def test_extract_metadata_roundtrip(spark):
    rows = [(1, "hello"), (2, "a longer document body"), (3, "")]
    df = attach_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {r.doc_id: r for r in extract_image_metadata(df).collect()}
    for doc_id, text in rows:
        blob = text.encode()
        assert got[doc_id].n_bytes == len(blob)
        assert got[doc_id].content_md5 == hashlib.md5(blob).hexdigest()
        w, h = decode_image_stub(blob)
        assert (got[doc_id].width, got[doc_id].height) == (w, h)


def test_blob_column_not_in_output(spark):
    df = attach_binary_payload(
        spark.createDataFrame([(1, "x")], "doc_id long, text string")
    )
    out = extract_image_metadata(df)
    assert "payload" not in out.columns  # downstream shuffles metadata only


def test_sample_frames_explode_and_stride(spark):
    """Every stride-th fixed-size window appears with correct sizes and
    fingerprints; trailing partial frame kept; empty blob yields none."""
    import hashlib

    from pyspark.sql import Row

    from another_map_reduce_spark.operators.multimodal import sample_frames

    rows = [
        Row(doc_id=1, payload=bytes(range(0, 10))),   # 3 frames of 4
        Row(doc_id=2, payload=b""),                    # no frames
        Row(doc_id=3, payload=bytes(range(0, 4))),     # exactly 1 frame
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, frame_size=4, stride=2).collect()
    got = {(r.doc_id, r.frame_idx): (r.frame_bytes, r.frame_fp) for r in out}
    b1 = bytes(range(0, 10))
    fp = lambda fr: hashlib.md5(fr.hex().upper().encode()).hexdigest()
    assert got == {
        (1, 0): (4, fp(b1[0:4])),
        (1, 2): (2, fp(b1[8:10])),   # stride skips idx 1; partial kept
        (3, 0): (4, fp(bytes(range(0, 4)))),
    }
