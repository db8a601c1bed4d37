"""Message-bus connector (sources/buslog.py) — the offset-log
contracts a broker-backed source would be trusted for: positional
offsets, replay-from-committed-offset across restarts, exactly-once
producer batch replay, metadata-only latest-offset listing."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.sources.buslog import (
    _BusLogStreamReader,
    _stable_hash,
    end_offsets,
    list_segments,
    produce,
    register_buslog,
)


def _mk_topic(tmp_path, n_per=5):
    root = str(tmp_path / "bus")
    for p in range(3):
        produce(
            root,
            "t",
            p,
            [(1_000_000 * (i + 1), f"k{p}", f"v{p}-{i}") for i in range(n_per)],
        )
    return root


def test_produce_assigns_consecutive_positional_offsets(tmp_path):
    root = _mk_topic(tmp_path)
    # second segment continues the offset sequence
    produce(root, "t", 0, [(9_000_000, "k0", "late")])
    segs = list_segments(root, "t")[0]
    assert [(b, c) for b, c, _ in segs] == [(0, 5), (5, 1)]
    assert end_offsets(root, "t") == {0: 6, 1: 5, 2: 5}


def test_batch_read_sees_every_record_once(spark, tmp_path):
    root = _mk_topic(tmp_path)
    register_buslog(spark)
    df = (
        spark.read.format("buslog")
        .option("path", root)
        .option("topic", "t")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 15
    # offsets are dense per partition and rows carry their payloads
    by_p = {}
    for r in rows:
        by_p.setdefault(r.partition, []).append(r.offset)
    assert all(sorted(v) == list(range(5)) for v in by_p.values())


def test_stream_resumes_from_committed_offsets(spark, tmp_path):
    """Two-phase consumption with a checkpoint: records produced
    between runs arrive in the second run EXACTLY once."""
    root = _mk_topic(tmp_path)
    register_buslog(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("buslog")
            .option("path", root)
            .option("topic", "t")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == 15
    produce(root, "t", 1, [(7_000_000, "k1", "new-a"), (7_100_000, "k1", "new-b")])
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 17  # only the 2 new records arrived
    news = {r.value for r in got.where(F.col("offset") >= 5).collect()}
    assert news == {"new-a", "new-b"}


def test_starting_offsets_latest_skips_history(tmp_path):
    root = _mk_topic(tmp_path)
    r = _BusLogStreamReader(
        {"path": root, "topic": "t", "startingOffsets": "latest"}
    )
    assert r.initialOffset() == {"0": 5, "1": 5, "2": 5}
    assert r.partitions(r.initialOffset(), r.latestOffset()) == []


def test_latest_offset_is_metadata_only(tmp_path, monkeypatch):
    """latestOffset must not open a single segment file."""
    root = _mk_topic(tmp_path)
    r = _BusLogStreamReader({"path": root, "topic": "t"})
    import builtins

    real_open = builtins.open

    def _guard(path, *a, **k):
        if str(path).endswith(".jsonl"):
            raise AssertionError(f"latestOffset opened a segment: {path}")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", _guard)
    assert r.latestOffset() == {"0": 5, "1": 5, "2": 5}


def test_producer_sink_batch_replay_is_idempotent(spark, tmp_path):
    """Exactly-once producer: a replayed micro-batch (same batch id)
    first removes its own committed segments, so reruns cannot
    duplicate records."""
    from another_map_reduce_spark.sources.buslog import (
        _BusLogCommit,
        _BusLogStreamWriter,
    )

    root = str(tmp_path / "bus2")
    w = _BusLogStreamWriter(
        {"path": root, "topic": "t", "numPartitions": "2"}
    )

    class Row:
        def __init__(self, ts, key, value):
            self.ts, self.key, self.value = ts, key, value

    rows = [Row(i * 1000, f"k{i % 4}", f"v{i}") for i in range(20)]
    msg = w.write(iter(rows))
    w.commit([msg], batchId=7)
    first = end_offsets(root, "t")
    assert sum(first.values()) == 20

    # crash-replay: the SAME batch rewrites and recommits
    msg2 = w.write(iter(rows))
    w.commit([msg2], batchId=7)
    assert end_offsets(root, "t") == first  # no duplication
    # a LATER batch appends after the replayed one
    msg3 = w.write(iter(rows[:4]))
    w.commit([msg3], batchId=8)
    assert sum(end_offsets(root, "t").values()) == 24

    # every record readable exactly once, keys routed stably
    seen = []
    for p, segs in list_segments(root, "t").items():
        for _b, _c, path in segs:
            for line in open(path, encoding="utf-8"):
                rec = json.loads(line)
                assert _stable_hash(rec["key"]) % 2 == p
                seen.append(rec["value"])
    assert len(seen) == 24


def test_produce_is_two_phase(tmp_path):
    """No visible partial segments: the only non-hidden files are
    complete renamed segments."""
    root = _mk_topic(tmp_path)
    for p, segs in list_segments(root, "t").items():
        pdir = os.path.dirname(segs[0][2])
        names = os.listdir(pdir)
        assert all(n.startswith("segment-") for n in names), names


def test_retention_truncate_before_and_log_start(spark, tmp_path):
    """Retention deletes only whole prefix segments, survivors keep
    their positional offsets, log-start advances, and BOTH readers —
    batch and a stream resuming from a now-truncated committed
    offset — clamp forward instead of failing."""
    from another_map_reduce_spark.sources.buslog import (
        log_start_offsets,
        truncate_before,
    )

    root = str(tmp_path / "bus")
    for seg in range(3):  # partition 0: offsets 0..14 in 3 segments
        produce(
            root, "t", 0,
            [(1_000 * (seg * 5 + i), "k", f"v{seg * 5 + i}") for i in range(5)],
        )
    register_buslog(spark)
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("buslog")
            .option("path", root)
            .option("topic", "t")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 15

    # cutoff mid-segment-2 (offset 8): only segment 1 (0-4) deletable
    moved = truncate_before(root, "t", {0: 8})
    assert moved == {0: 5}
    assert log_start_offsets(root, "t") == {0: 5}
    assert [(b, c) for b, c, _ in list_segments(root, "t")[0]] == [
        (5, 5), (10, 5)
    ]
    # batch read starts at the log-start, offsets preserved
    batch = (
        spark.read.format("buslog")
        .option("path", root)
        .option("topic", "t")
        .load()
        .collect()
    )
    assert sorted(r.offset for r in batch) == list(range(5, 15))

    # fresh consumer (no checkpoint) starts at log-start
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    q = (
        spark.readStream.format("buslog")
        .option("path", root)
        .option("topic", "t")
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out2).count() == 10

    # the ORIGINAL consumer already committed offset 15; retention past
    # its position must clamp (not crash, not re-read)
    truncate_before(root, "t", {0: 100})  # cutoff beyond the log end
    assert log_start_offsets(root, "t") == {0: 15}
    produce(root, "t", 0, [(99_000, "k", "after-retention")])
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 16
    assert {r.value for r in got.where(F.col("offset") == 15).collect()} == {
        "after-retention"
    }
