"""Write-once artifact cache (another_map_reduce_spark.artifacts)."""

from __future__ import annotations

import os

from another_map_reduce_spark.artifacts import (
    ensure_artifact,
    source_fingerprint,
)


def test_builder_runs_once_per_fingerprint(tmp_path):
    path = str(tmp_path / "idx")
    calls = []
    fp = "abc123"
    assert ensure_artifact(path, fp, lambda: calls.append(1)) is True
    assert ensure_artifact(path, fp, lambda: calls.append(1)) is False
    assert calls == [1]


def test_changed_fingerprint_rebuilds(tmp_path):
    path = str(tmp_path / "idx")
    calls = []
    ensure_artifact(path, "v1", lambda: calls.append("a"))
    ensure_artifact(path, "v2", lambda: calls.append("b"))
    assert calls == ["a", "b"]


def test_failed_build_leaves_no_marker(tmp_path):
    path = str(tmp_path / "idx")

    def boom():
        raise RuntimeError("build crashed")

    try:
        ensure_artifact(path, "fp", boom)
    except RuntimeError:
        pass
    # no marker → the next attempt builds again
    calls = []
    assert ensure_artifact(path, "fp", lambda: calls.append(1)) is True
    assert calls == [1]


def test_source_fingerprint_tracks_file_and_params(tmp_path):
    src = tmp_path / "documents.parquet"
    src.write_bytes(b"x" * 10)
    fp1 = source_fingerprint(str(tmp_path), "documents", k=128)
    assert fp1 == source_fingerprint(str(tmp_path), "documents", k=128)
    assert fp1 != source_fingerprint(str(tmp_path), "documents", k=64)
    src.write_bytes(b"y" * 11)
    os.utime(src)
    assert fp1 != source_fingerprint(str(tmp_path), "documents", k=128)


def test_schema_rev_invalidates_fingerprints(tmp_path, monkeypatch):
    import another_map_reduce_spark.artifacts as A

    src = tmp_path / "documents.parquet"
    src.write_bytes(b"x")
    fp1 = A.source_fingerprint(str(tmp_path), "documents")
    monkeypatch.setattr(A, "ARTIFACT_SCHEMA_REV", A.ARTIFACT_SCHEMA_REV + 1)
    assert fp1 != A.source_fingerprint(str(tmp_path), "documents")
