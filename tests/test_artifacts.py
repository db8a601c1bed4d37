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


def test_pid_layout_atexit_and_sibling_sweep(tmp_path):
    """Residue lifecycle of pid-keyed /tmp layouts (r11): an orderly
    exit removes the process's OWN registered layouts (atexit), and a
    second process sweeps what a dead first process left behind."""
    import os
    import subprocess
    import sys
    import tempfile

    from another_map_reduce_spark.artifacts import (
        sweep_stale_pid_siblings,
    )

    prefix = f"amrs_residue_test_{os.getpid()}"
    # 1) orderly exit → atexit removes the registered layout
    code = (
        "import os, tempfile\n"
        "from another_map_reduce_spark.artifacts import register_pid_layout\n"
        f"p = register_pid_layout(os.path.join(tempfile.gettempdir(),"
        f" '{prefix}_' + str(os.getpid())))\n"
        "os.makedirs(p, exist_ok=True)\n"
        "open(os.path.join(p, 'x'), 'w').write('1')\n"
        "print(p)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
        cwd="/root/repo",
    )
    made = out.stdout.strip()
    assert not os.path.isdir(made), "atexit did not remove own layout"

    # 2) a dead sibling's layout (simulated: a pid that no longer
    # exists) is swept by the next process's setup call
    dead = os.path.join(tempfile.gettempdir(), f"{prefix}_999999999")
    os.makedirs(dead, exist_ok=True)
    open(os.path.join(dead, "x"), "w").write("1")
    sweep_stale_pid_siblings(prefix)
    assert not os.path.isdir(dead), "sweep left a dead sibling's layout"
