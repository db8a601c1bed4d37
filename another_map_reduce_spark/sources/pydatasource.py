"""Custom connector via Spark 4's Python DataSource API — [extension].

The reference's only source is a hand-rolled text-file scan: the
coordinator enumerates ``./files/*.txt`` and each map task reads ONE
whole file (`/root/reference/src/coordinator.rs:216-224`,
`src/worker.rs:93`).  ``sources/text.py`` expresses that with Spark's
built-in text reader; this module re-expresses it through Spark's
OFFICIAL connector extension point (``pyspark.sql.datasource``,
new in Spark 4) — the API a user would reach for when their source is
NOT a built-in format (a proprietary archive, an object-store listing
service, a message log).  The partitioning contract is the
reference's own: one file = one input partition = one task.

Scale notes: ``partitions()`` runs once on the driver (a directory
listing — O(files) metadata, no data); ``read()`` streams one file per
task in the Python worker, so parallelism = file count, exactly the
reference's scheduling model and its known limitation (one giant file
does not split — the built-in text source in sources/text.py is the
splittable alternative).  The reader is stdlib-only, so cloudpickle
ships it to workers with no package dependency.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _RefTextReader(DataSourceReader):
    def __init__(self, options: dict):
        # spark.read.format("reftext").load(p) delivers p as options["path"]
        self._glob = options.get("path")
        if not self._glob:
            raise ValueError("reftext requires a path, e.g. .load('/dir/*.txt')")

    def partitions(self):
        import glob

        # sorted: deterministic partition numbering run-to-run
        return [_FilePartition(p) for p in sorted(glob.glob(self._glob))]

    def read(self, partition: _FilePartition):
        # PySpark substitutes [None] when partitions() returns an empty
        # list (zero files matched the glob) — yield nothing so an
        # empty directory reads as an empty frame, not an executor
        # AttributeError.
        if partition is None:
            return
        with open(partition.path, encoding="utf-8") as f:
            yield (partition.path, f.read())


class RefTextDataSource(DataSource):
    """``spark.read.format("reftext")`` — whole-file text records with
    the reference's 1-file-1-task partitioning."""

    @classmethod
    def name(cls) -> str:
        return "reftext"

    def schema(self) -> str:
        return "path string, text string"

    def reader(self, schema) -> _RefTextReader:
        return _RefTextReader(self.options)

    def streamReader(self, schema) -> "_RefTextStreamReader":
        return _RefTextStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "_RefTextStreamWriter":
        return _RefTextStreamWriter(self.options)

    def writer(self, schema, overwrite: bool) -> "_RefTextWriter":
        return _RefTextWriter(self.options, overwrite)


def register_reftext(spark: SparkSession) -> None:
    """Idempotent registration of the connector with a session.

    The connector classes are registered for cloudpickle BY-VALUE
    serialization: Spark drives a Python DataSource from dedicated
    runner processes (``python_streaming_source_runner`` for the
    streaming half) that deserialize the pickled DataSource but do
    NOT apply ``addPyFile``/SparkFiles paths, so a by-reference pickle
    of this module raises ModuleNotFoundError there.  By-value makes
    the connector self-contained in the pickle — the same property the
    batch reader gets implicitly from being stdlib-only.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(RefTextDataSource)


# ---------------------------------------------------------------------------
# Streaming half — the reference's file-grid enumeration as a stream
# ---------------------------------------------------------------------------


class _RefTextStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("reftext")`` — the reference's
    enumerate-the-file-grid scheduling (`coordinator.rs:216-224`) as a
    micro-batch STREAMING source: each trigger lists the glob, the
    files not yet seen become that batch's partitions (still one file
    = one task, executor-side reads), and the offset is the set of
    files already ingested.  Exactly the semantics of Spark's built-in
    FileStreamSource, re-derived through the Python connector API, so
    the directory the reftext WRITER appends to is tail-able as a
    stream.

    Offset honesty: the JSON offset carries the sorted seen-file list,
    so it grows O(#files) — fine for the reference's grid (tens of
    files) and for append-mostly directories up to ~10^4 files; past
    that a production source compacts the offset into a log + high-
    watermark (what FileStreamSource's HDFSMetadataLog does).  Files
    are assumed immutable-once-visible (the writer's two-phase rename
    guarantees it: a file appears only after its content is complete);
    deletions are ignored — the offset remembers them as seen.
    """

    def __init__(self, options: dict):
        self._glob = options.get("path")
        if not self._glob:
            raise ValueError(
                "reftext stream requires a path, e.g. .load('/dir/*.txt')"
            )
        # Same knob as Spark's built-in file sources: a file listed at
        # latestOffset() time can be deleted before its batch's task
        # reads it (compaction, TTL cleanup).  Default STRICT — fail
        # the batch, because silently losing an ingested-but-unread
        # file breaks exactly-once; opt in to skip-and-continue when
        # the directory is known to be pruned by an external process.
        self._ignore_missing = str(
            options.get("ignoreMissingFiles", "false")
        ).lower() in ("true", "1", "yes")

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        import glob

        return {"files": sorted(glob.glob(self._glob))}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        return [
            _FilePartition(p)
            for p in end.get("files", [])
            if p not in seen
        ]

    def read(self, partition: _FilePartition):
        if partition is None:
            return
        try:
            f = open(partition.path, encoding="utf-8")
        except FileNotFoundError:
            if self._ignore_missing:
                return
            raise
        with f:
            yield (partition.path, f.read())

    def commit(self, end: dict) -> None:
        # Offsets are self-contained (the seen-file list); nothing to
        # clean up on progression — the checkpoint log owns durability.
        pass


# ---------------------------------------------------------------------------
# Streaming writer half — the same two-phase sink, per micro-batch
# ---------------------------------------------------------------------------


class _RefTextStreamCommit(WriterCommitMessage):
    """Per-task streaming commit message: temp file + partition id
    (the batch id arrives driver-side in ``commit()``)."""

    def __init__(self, tmp: str, pid: int):
        self.tmp = tmp
        self.pid = pid


class _RefTextStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("reftext")`` — the batch writer's
    two-phase temp+rename protocol applied PER MICRO-BATCH.  Final
    names are ``part-<batchId>-<pid>.txt``: keyed by batch id and
    partition only (no job/attempt uuid), so a batch REPLAYED after a
    failure renames over its own previous attempt's files —
    idempotent re-output, which is exactly the property a streaming
    sink needs for end-to-end exactly-once under Spark's
    offset-tracking contract (same batch ⇒ same data ⇒ same files).
    Rename-over alone assumes the replay repartitions identically;
    ``commit()`` also sweeps any ``part-<batchId>-*`` file NOT in this
    attempt's commit messages, so a narrower replay (fewer tasks after
    an executor loss) removes the wider failed attempt's leftovers.
    That sweep supersedes a touch-only-listed-paths rule for FINAL
    files: the output directory is single-query-owned (two streaming
    queries sharing one directory would collide on the
    ``part-<batchId>-<pid>`` names regardless, and the sweep would
    actively delete the other query's same-batch files).  Temps carry
    uuid names inside the shared ``_temporary/`` dir, and commit/abort
    remove only THEIR OWN temp paths — no rmtree of shared temp state
    (the concurrent-writer lesson from the batch writer applies doubly
    here, since batch N+1 may be planning while N's temps still exist
    on a slow store).
    """

    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("reftext stream write requires a target directory")

    def write(self, rows):
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp_dir = os.path.join(self._dir, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, f"{uuid.uuid4().hex}-{pid}")
        with open(tmp, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(" ".join("" if v is None else str(v) for v in row))
                f.write("\n")
        return _RefTextStreamCommit(tmp, pid)

    def commit(self, messages, batchId: int) -> None:
        import glob
        import os

        finals = set()
        for m in messages:
            if m is not None:
                final = os.path.join(
                    self._dir,
                    f"part-{batchId:010d}-{m.pid:05d}.txt",
                )
                os.replace(m.tmp, final)
                finals.add(final)
        # A replayed batch may repartition differently than the failed
        # attempt (fewer tasks after an executor loss), so renaming over
        # same-named files alone can strand the extra part files of the
        # wider attempt.  Idempotency is per BATCH, not per task: sweep
        # any part-<batchId>-* not produced by THIS attempt.
        for stale in glob.glob(
            os.path.join(self._dir, f"part-{batchId:010d}-*.txt")
        ):
            if stale not in finals:
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass
        try:
            os.rmdir(os.path.join(self._dir, "_temporary"))
        except OSError:
            pass

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.tmp)
                except FileNotFoundError:
                    pass


# ---------------------------------------------------------------------------
# Writer half — the reference's atomic text sink through the same API
# ---------------------------------------------------------------------------


class _RefTextCommit(WriterCommitMessage):
    """Per-task commit message: (temp file, final file) rename pair."""

    def __init__(self, tmp: str, final: str):
        self.tmp = tmp
        self.final = final


class _RefTextWriter(DataSourceWriter):
    """One output text file per partition, space-joined columns, with
    the reference's two-phase atomic commit (`worker.rs:107-114`):
    tasks write to `_temporary/<uuid>` and report the rename pair; the
    DRIVER renames every temp file into place only in ``commit()``, so
    a failed/speculated task never publishes partial output — rename
    is atomic on POSIX, exactly the property the reference leaned on.
    ``abort()`` deletes the temps.  Plain-Python rows stream through
    the Python worker; this is the convenience/extension-point path —
    the performance text sink remains sinks.py's JVM writer.

    Storage contract, stated honestly: tasks write on executors and
    the driver renames, so the target must be storage BOTH can see —
    the reference made the identical assumption (its workers and
    coordinator share ``./files``, README.md:18-19), satisfied here
    by local mode and in production by NFS/shared volumes.  On an
    object store without atomic rename the publish step becomes the
    classic committer trade-off (copy-on-commit, or direct write +
    manifest) — that is a property of the store, not of this
    protocol, and Spark's built-in sinks face the same fork
    (FileOutputCommitter v1/v2, magic committers).
    """

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("reftext write requires a target directory")
        self._overwrite = overwrite
        # Job-scoped identity, minted once on the DRIVER before the
        # writer is pickled to tasks: (a) the temp dir is per-job, so
        # two concurrent writes to one target can't delete each
        # other's in-flight files; (b) append-mode final names carry
        # the job id, so successive appends accumulate instead of
        # clobbering the previous job's part-N files.
        self._job = uuid.uuid4().hex[:12]

    def write(self, rows):
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp_dir = os.path.join(self._dir, "_temporary", self._job)
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, f"{uuid.uuid4().hex}-{pid}")
        stem = (
            f"part-{pid:05d}.txt"
            if self._overwrite
            else f"part-{self._job}-{pid:05d}.txt"
        )
        final = os.path.join(self._dir, stem)
        with open(tmp, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(" ".join("" if v is None else str(v) for v in row))
                f.write("\n")
        return _RefTextCommit(tmp, final)

    def commit(self, messages):
        import glob
        import os
        import shutil

        if self._overwrite:
            # mode("overwrite") must not leave stale part files from a
            # previous (possibly wider) write: a 4-partition rewrite of
            # an 8-partition target would otherwise read back as a mix
            # of both jobs.  Delete every pre-existing part file first —
            # the renames below then publish exactly this job's output.
            for stale in glob.glob(os.path.join(self._dir, "part-*.txt")):
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass
        for m in messages:
            if m is not None:
                os.replace(m.tmp, m.final)
        shutil.rmtree(
            os.path.join(self._dir, "_temporary", self._job),
            ignore_errors=True,
        )
        # Tidy the shared _temporary parent when this was the last job.
        try:
            os.rmdir(os.path.join(self._dir, "_temporary"))
        except OSError:
            pass

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(
            os.path.join(self._dir, "_temporary", self._job),
            ignore_errors=True,
        )
        try:
            os.rmdir(os.path.join(self._dir, "_temporary"))
        except OSError:
            pass
