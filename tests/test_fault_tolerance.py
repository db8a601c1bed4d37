"""Fault-tolerance parity: Spark task retry ⇔ the reference's
coordinator-driven re-execution.

The reference's one non-trivial infrastructure behavior is timeout-based
task re-execution (`/root/reference/src/coordinator.rs:53-106`: a task
not completed within 10 s is handed to the next polling worker, and the
atomic rename commit makes the re-run safe).  On Spark that job is the
scheduler's: `spark.task.maxFailures` retries a failed task on another
slot, speculation re-launches stragglers, and the committed-output
protocol keeps re-runs idempotent.  SURVEY §2a maps the mechanisms on
paper; this test DEMONSTRATES the mapping — a map task that crashes on
its first attempt, a job that still completes, and a word count that is
exactly right.

Runs in a subprocess because retry needs ``master=local[4, 2]`` (2
task attempts) while the shared test session is a plain ``local[4]``
(maxFailures=1 — the same injected failure there kills the job, which
the test also asserts: the failure is REAL, retry is what absorbs it).
"""

from __future__ import annotations

import subprocess
import sys

_JOB = r"""
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from another_map_reduce_spark.session import get_spark
from another_map_reduce_spark.operators.wordcount import word_count

marker_dir = sys.argv[1]
retries_allowed = sys.argv[2] == "retry"
master = "local[4, 2]" if retries_allowed else "local[4]"
spark = get_spark(app_name="ft-parity", master=master, shuffle_partitions=4)

rows = [("doc-%d" % i, "alpha beta beta gamma gamma gamma") for i in range(40)]
docs = spark.createDataFrame(rows, "doc_id STRING, text STRING").repartition(4)

def flaky_identity(batches):
    # Crash EVERY partition's first attempt — the injected fault.  The
    # marker file is the out-of-band proof the crash really fired
    # (accumulators from failed tasks are unreliable by design).
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx.attemptNumber() == 0:
        open(os.path.join(marker_dir, "failed-%d" % ctx.partitionId()), "w").close()
        raise RuntimeError("injected first-attempt failure (reference straggler stand-in)")
    for b in batches:
        yield b

flaky = docs.mapInPandas(flaky_identity, docs.schema)
out = {{r["word"]: r["cnt"] for r in word_count(flaky).collect()}}
assert out == {{"alpha": 40, "beta": 80, "gamma": 120}}, out
print("JOB-OK")
"""


def _run(tmp_path, mode: str) -> subprocess.CompletedProcess:
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    marker = tmp_path / f"markers-{mode}"
    marker.mkdir()
    return (
        subprocess.run(
            [sys.executable, "-c", _JOB.format(repo=repo), str(marker), mode],
            capture_output=True,
            text=True,
            timeout=300,
        ),
        marker,
    )


def test_task_retry_recovers_injected_failure(tmp_path):
    """With maxFailures=2 every partition's first attempt crashes, the
    retries succeed, and the word count is exact — Spark's stand-in for
    coordinator.rs re-execution, demonstrated end-to-end."""
    proc, marker = _run(tmp_path, "retry")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "JOB-OK" in proc.stdout
    # the fault actually fired, on every partition
    assert len(list(marker.iterdir())) == 4


def test_same_failure_without_retry_kills_job(tmp_path):
    """Control: the identical fault under maxFailures=1 fails the job —
    proving the retry, not a vacuous injection, is what saved the run
    above."""
    proc, marker = _run(tmp_path, "noretry")
    assert proc.returncode != 0
    assert "JOB-OK" not in proc.stdout
    assert len(list(marker.iterdir())) >= 1
