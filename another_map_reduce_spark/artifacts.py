"""Write-once derived-artifact cache for stored-index queries.

Several queries materialize a derived artifact of the HISTORY side of
an incremental operator — the LSH band index (`operators.dedup.
lsh_band_index`), the IVF centroid+postings index (`operators.
similarity.build_ivf_index`).  In the daily-pipeline regime those
artifacts are built once and amortized across every later delta; a
registered query that rebuilds its index on every invocation therefore
prices the WRONG thing (the one-off build, not the recurring probe).

`ensure_artifact` gives those queries the write-once contract: the
builder runs only when the artifact is missing or its fingerprint —
derived from the SOURCE parquet's (path, size, mtime) plus the build
parameters — has changed.  A changed fixture or parameter set rebuilds
automatically; a repeated suite/bench invocation reuses the store, so
the suite row prices the probe, exactly like a real deployment.

The marker is written AFTER the builder succeeds (a crashed build
leaves no marker → next run rebuilds), mirroring the two-phase
temp+rename commit of the reference's sink (`/root/reference/src/
worker.rs:107-114`) at artifact granularity.  Serial-harness contract:
one builder per path at a time (the driver/bench/pytest harnesses are
serial; concurrent builders would race the marker like any overwrite).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

_MARKER = "_AMRS_ARTIFACT"

# Bump this whenever ANY index-producing operator changes its on-disk
# layout or construction (band hashing, shingle definition, centroid
# training, chunking) — artifacts persist in /tmp ACROSS working
# sessions, and a stale index built by old code probed by new code
# would silently miss matches instead of failing.  The revision rides
# in every fingerprint, so bumping it invalidates every cached
# artifact at once.
ARTIFACT_SCHEMA_REV = 1


def source_fingerprint(sf_dir: str, table: str, **params: object) -> str:
    """Fingerprint of one source table + build parameters.

    Uses the parquet file's (size, mtime_ns) — cheap, no data scan —
    so a regenerated fixture at the same path invalidates the cache;
    ``ARTIFACT_SCHEMA_REV`` folds in so algorithm revisions do too.
    """
    p = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(p)
    key = json.dumps(
        {"src": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns,
         "rev": ARTIFACT_SCHEMA_REV,
         "params": {k: repr(v) for k, v in sorted(params.items())}},
        sort_keys=True,
    )
    return hashlib.md5(key.encode()).hexdigest()


def ensure_artifact(
    path: str, fingerprint: str, builder: Callable[[], None]
) -> bool:
    """Run ``builder()`` unless ``path`` already holds an artifact with
    this ``fingerprint``.  Returns True iff the builder ran."""
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker, encoding="utf-8") as fh:
            if fh.read().strip() == fingerprint:
                return False
    except OSError:
        pass
    builder()
    os.makedirs(path, exist_ok=True)
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write(fingerprint)
    return True


_PID_LAYOUTS: set[str] = set()


def register_pid_layout(path: str) -> str:
    """Track one of THIS process's pid-keyed temp layouts for atexit
    removal — the complement of ``sweep_stale_pid_siblings``: siblings
    clean up after dead processes, atexit cleans up after ORDERLY
    exits, so a long-lived host only ever carries layouts of live or
    crashed-this-instant processes.  Idempotent; returns ``path`` so
    call sites can wrap their os.path.join in place."""
    import atexit

    if not _PID_LAYOUTS:
        atexit.register(_cleanup_pid_layouts)
    _PID_LAYOUTS.add(path)
    return path


def _cleanup_pid_layouts() -> None:
    import shutil

    for p in list(_PID_LAYOUTS):
        shutil.rmtree(p, ignore_errors=True)
    _PID_LAYOUTS.clear()


def sweep_stale_pid_siblings(prefix: str) -> None:
    """Remove tempdir layouts left by DEAD sibling processes.

    pid-keying the per-process temp layouts (dpp fact table, bucketed
    catalog table paths, streaming relay roots) stops concurrent
    sessions clobbering each other, but every process then leaves a
    fresh ``{prefix}_{pid}`` directory that nothing cleans up — a
    long-lived host accumulates unbounded residue.  This sweep runs at
    each site's setup: any sibling ``{prefix}_{pid}`` whose pid is not
    our own and no longer refers to a LIVE process is deleted (a live
    sibling is left alone — it may be mid-query).  pid reuse can at
    worst spare a stale dir for one more round; it can never delete a
    live process's layout.
    """
    import re
    import shutil
    import tempfile

    tmp = tempfile.gettempdir()
    pat = re.compile(re.escape(prefix) + r"_(\d+)$")
    me = os.getpid()
    try:
        names = os.listdir(tmp)
    except OSError:
        return
    for name in names:
        m = pat.match(name)
        if not m or int(m.group(1)) == me:
            continue
        pid = int(m.group(1))
        try:
            os.kill(pid, 0)
            continue  # live sibling — leave it alone
        except ProcessLookupError:
            pass
        except PermissionError:
            continue  # live, owned by someone else
        shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)
