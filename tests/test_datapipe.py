"""Unit tests for operators/datapipe.py — semantics the differential
oracle test (test_relational.py) can't see: edge cases, proportions,
and determinism guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from another_map_reduce_spark.operators.datapipe import (
    chunk_documents,
    normalize_text,
    redact_pii,
    split_assign,
)


def test_split_proportions_and_determinism(spark):
    df = spark.range(20000).select(F.col("id"))
    counts = dict(
        df.select(split_assign(F.col("id")).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    total = sum(counts.values())
    assert total == 20000
    # 79.7% / 10.2% / 10.2% nominal; wide tolerance for hash noise
    assert 0.77 < counts["train"] / total < 0.83
    assert 0.08 < counts["val"] / total < 0.13
    assert 0.08 < counts["test"] / total < 0.13
    # determinism: a second evaluation is identical
    again = dict(
        df.select(split_assign(F.col("id")).alias("s")).groupBy("s").count().collect()
    )
    assert counts == again


def test_split_salt_redraws(spark):
    df = spark.range(2000)
    a = df.select(split_assign(F.col("id")).alias("s")).collect()
    b = df.select(split_assign(F.col("id"), salt="v2").alias("s")).collect()
    assert any(x != y for x, y in zip(a, b))


def test_redact_pii_shapes(spark):
    rows = [
        Row(t="mail bob.smith+x@sub.example.co.uk now"),
        Row(t="call 555-123-4567 or 555 987 6543"),
        Row(t="ssn 123-45-6789 is not a phone"),
        Row(t="id 12345678901 stays, 55-123-4567 stays too"),
        Row(t="no pii here"),
    ]
    out = [
        r.r
        for r in spark.createDataFrame(rows)
        .select(redact_pii(F.col("t")).alias("r"))
        .collect()
    ]
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "call <PHONE> or <PHONE>"
    assert out[2] == "ssn <SSN> is not a phone"  # SSN wins over phone
    # unbroken digit runs / wrong groupings must NOT match
    assert out[3] == "id 12345678901 stays, 55-123-4567 stays too"
    assert out[4] == "no pii here"


def test_chunk_documents_windows(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([Row(doc_id=1, text=text), Row(doc_id=2, text="a b"), Row(doc_id=3, text="")])
    out = chunk_documents(df, chunk_size=4, overlap=2)
    rows = {(r.doc, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in out.collect()}
    # doc 1: starts 0,2,4,6,8 → last window is a trailing partial
    assert rows[(1, 0)] == (4, "w0 w1 w2 w3")
    assert rows[(1, 1)] == (4, "w2 w3 w4 w5")
    assert rows[(1, 4)] == (2, "w8 w9")
    # doc 2 shorter than one window → single partial chunk
    assert rows[(2, 0)] == (2, "a b")
    # empty doc → no chunks
    assert not any(d == 3 for d, _ in rows)


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_normalize_text(spark):
    rows = [Row(t="  Hello,   WORLD!! (x1) "), Row(t="a-b_c")]
    out = [
        r.n
        for r in spark.createDataFrame(rows)
        .select(normalize_text(F.col("t")).alias("n"))
        .collect()
    ]
    assert out[0] == "hello world x1"
    assert out[1] == "a b c"


def test_chunk_documents_coverage_property(spark):
    """Every token position is covered by ≥1 chunk; consecutive chunks
    overlap by exactly `overlap` except the trailing partial; chunk
    texts reassemble the document."""
    import random

    rng = random.Random(42)
    rows = [
        Row(doc_id=i, text=" ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(rng.choices(range(1, 40), k=25))
    ]
    size, ov = 8, 3
    out = chunk_documents(
        spark.createDataFrame(rows), chunk_size=size, overlap=ov
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc, []).append(r)
    for i, n in enumerate(int(r.text.count(" ")) + 1 for r in rows):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        toks = rows[i].text.split(" ")
        step = size - ov
        # indices are dense from 0
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        rebuilt = []
        for c in chunks:
            start = c.chunk_idx * step
            expect = toks[start : start + size]
            assert c.chunk_text.split(" ") == expect
            assert c.n_tokens == len(expect)
            rebuilt.extend(expect if not rebuilt else expect[ov:] if start + ov <= len(toks) else [])
        # full positional coverage: last chunk reaches the end
        last = chunks[-1]
        assert last.chunk_idx * step + last.n_tokens == len(toks)


def test_hash_sample_deterministic_and_stratified(spark):
    """Same key set under repartitioning; rate column honored per row;
    observed rates near the hex thresholds."""
    from another_map_reduce_spark.operators.datapipe import hash_sample

    df = spark.range(4000).select(F.col("id").alias("k"))
    kept1 = {r.k for r in df.where(hash_sample(F.col("k"), "80")).collect()}
    kept2 = {
        r.k
        for r in df.repartition(13)
        .where(hash_sample(F.col("k"), "80"))
        .collect()
    }
    assert kept1 == kept2
    assert 0.45 < len(kept1) / 4000 < 0.55
    small = {r.k for r in df.where(hash_sample(F.col("k"), "1a")).collect()}
    assert small < kept1  # '1a' < '80' → strictly nested sample
    assert 0.06 < len(small) / 4000 < 0.15


def test_repetition_stats_hand_computed(spark):
    from another_map_reduce_spark.operators.datapipe import repetition_stats

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),   # bigrams: ab ba ab ba ab
            Row(doc_id=2, text="x y z"),          # bigrams: xy yz — all unique
            Row(doc_id=3, text="solo"),           # < 2 tokens → excluded
        ]
    )
    rows = {r["doc"]: r for r in repetition_stats(df, "text", "doc_id", n=2).collect()}
    assert set(rows) == {1, 2}
    r1 = rows[1]
    assert r1["total_grams"] == 5 and r1["distinct_grams"] == 2
    assert r1["dup_gram_frac"] == pytest.approx(0.6)
    assert r1["top_gram_frac"] == pytest.approx(0.6)  # "a b" ×3 of 5
    r2 = rows[2]
    assert r2["total_grams"] == 2 and r2["distinct_grams"] == 2
    assert r2["dup_gram_frac"] == 0.0
    assert r2["top_gram_frac"] == pytest.approx(0.5)


def test_decontaminate_flags_only_overlapping_docs(spark):
    from another_map_reduce_spark.operators.datapipe import decontaminate

    holdout = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps")]
    )
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="lazy dog saw the quick brown fox leave"),
            Row(doc_id=2, text="completely unrelated words only here"),
            Row(doc_id=3, text="quick brown fox jumps high today"),
        ]
    )
    out = {
        r["doc"]: r
        for r in decontaminate(corpus, holdout, "text", "doc_id", n=3).collect()
    }
    # doc 1 shares "the quick brown" + "quick brown fox"; doc 3 shares
    # "quick brown fox" + "brown fox jumps"; doc 2 shares nothing.
    assert set(out) == {1, 3}
    assert out[1]["n_shared_grams"] == 2
    assert out[3]["n_shared_grams"] == 2
    assert out[1]["n_holdout_docs"] == 1 and out[3]["n_holdout_docs"] == 1


def test_dup_substring_removal_invariance(spark, sf_dir):
    """The excision contract of Lee et al. exact-substring dedup, run
    on the real corpus: (a) token accounting is consistent, (b) spans
    only exist where something was removed, and (c) the cleaned corpus
    carries ZERO of the original duplicated windows — every copy of a
    cross-document W-window is excised, so recomputing the window
    inventory over kept_text finds none of the originally-duplicated
    hashes (new dup windows can only arise from splice seams, and are
    bounded by spans x (W-1) tokens; asserted << original dup mass)."""
    import hashlib
    from collections import defaultdict

    from another_map_reduce_spark.plans.datapipe import (
        _DUP_W,
        dup_substring_removal,
    )

    rows = dup_substring_removal(spark, sf_dir).collect()
    assert all(
        0 <= r.n_removed_tokens <= r.n_tokens and (r.n_spans > 0) == (r.n_removed_tokens > 0)
        for r in rows
    )

    def windows(text):
        toks = [t for t in text.lower().split()]
        return [
            hashlib.md5(" ".join(toks[i : i + _DUP_W]).encode()).hexdigest()
            for i in range(len(toks) - _DUP_W + 1)
        ]

    # original duplicated-hash set, recomputed independently in Python
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()}
    by_hash = defaultdict(set)
    for d, t in docs.items():
        for h in windows(t or ""):
            by_hash[h].add(d)
    orig_dup = {h for h, ds in by_hash.items() if len(ds) >= 2}
    assert orig_dup, "fixture should contain cross-doc duplicate windows"

    residual_by_hash = defaultdict(set)
    for r in rows:
        for h in windows(r.kept_text):
            residual_by_hash[h].add(r.doc_id)
    # (c1) none of the ORIGINAL duplicated windows survive anywhere
    assert not (set(residual_by_hash) & orig_dup)
    # (c2) splice seams create almost no NEW cross-doc duplicates
    new_dup = sum(1 for h, ds in residual_by_hash.items() if len(ds) >= 2)
    assert new_dup <= max(2, len(orig_dup) // 50), (new_dup, len(orig_dup))


def test_length_batching_sorted_never_worse(spark, sf_dir):
    """Length-sorted batching can only reduce padding: within every
    batch the max shrinks toward the mean when neighbors have similar
    lengths, so sorted pad_frac <= random pad_frac (and both strategies
    account for the identical token total)."""
    from another_map_reduce_spark.plans.datapipe import (
        length_batching_report,
    )

    rows = {r.strategy: r for r in length_batching_report(spark, sf_dir).collect()}
    assert rows["sorted"].total_tokens == rows["random"].total_tokens
    assert rows["sorted"].n_batches == rows["random"].n_batches
    assert rows["sorted"].pad_frac <= rows["random"].pad_frac
    assert rows["sorted"].padded_tokens <= rows["random"].padded_tokens


def test_class_balanced_sample_equalizes_exactly(spark):
    """Every class keeps exactly min-class-size rows, chosen
    deterministically (same set across reruns/repartitioning)."""
    from another_map_reduce_spark.operators.datapipe import (
        class_balanced_sample,
    )

    rows = [(i, "big") for i in range(100)] + [
        (1000 + i, "small") for i in range(7)
    ] + [(2000 + i, "mid") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, cls string")
    kept = class_balanced_sample(df, "cls", F.col("id")).collect()
    by_cls: dict[str, set] = {}
    for r in kept:
        by_cls.setdefault(r.cls, set()).add(r.id)
    assert {c: len(s) for c, s in by_cls.items()} == {
        "big": 7, "small": 7, "mid": 7
    }
    assert by_cls["small"] == set(range(1000, 1007))  # whole min class
    # determinism under a different partitioning
    kept2 = class_balanced_sample(
        df.repartition(13), "cls", F.col("id")
    ).collect()
    assert {(r.cls, r.id) for r in kept2} == {(r.cls, r.id) for r in kept}


def test_pps_sample_is_weight_proportional_and_deterministic(spark, sf_dir):
    """The PPS draw keeps ~_PPS_N rows, every row heavier than the
    step with certainty, and reruns reproduce the exact same sample
    (key_checksum equality is the rerun-determinism pin — the
    distributed prefix sum must not depend on partition boundaries)."""
    from another_map_reduce_spark.plans.datapipe import (
        _PPS_N,
        pps_systematic_sample,
    )

    a = pps_systematic_sample(spark, sf_dir).collect()
    b = pps_systematic_sample(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    total_kept = sum(r.n_kept for r in a)
    # boundary crossings: exactly _PPS_N boundaries exist in (0, total],
    # a row can cross several, so kept ≤ N with equality unless some
    # row spans 2+ steps
    assert 0 < total_kept <= _PPS_N
    assert total_kept >= _PPS_N * 0.9  # no pathological collapse


# ---------------------------------------------------------------------------
# Priority sampling (operators/datapipe.py)
# ---------------------------------------------------------------------------


def test_priority_sample_matches_exhaustive_replay(spark):
    import hashlib

    from another_map_reduce_spark.operators.datapipe import priority_sample

    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    k = 16
    got = priority_sample(df, F.col("id"), F.col("w"), k=k).collect()

    # Independent Python replay of the exact arithmetic.
    def q(i, w):
        h = int(
            hashlib.md5(f"amrs-priority-v1{i}".encode()).hexdigest()[:13], 16
        )
        u = (h + 1) / float(1 << 52)
        return float(w) / u

    pri = sorted(((q(i, w), i, w) for i, w in rows), key=lambda t: (-t[0], t[1]))
    tau = pri[k][0]
    expect = [(i, float(w), qv, tau, max(float(w), tau)) for qv, i, w in pri[:k]]
    assert [(r._key, r._w, r._q, r._tau, r._ht) for r in got] == expect


def test_priority_sample_census_when_corpus_fits(spark):
    from another_map_reduce_spark.operators.datapipe import priority_sample

    df = spark.createDataFrame([(1, 10), (2, 20)], ["id", "w"])
    got = priority_sample(df, F.col("id"), F.col("w"), k=5).collect()
    # ≤ k rows: everything kept, τ = 0, HT weight = true weight (the
    # estimator degenerates to the exact sum).
    assert sorted((r._key, r._tau, r._ht) for r in got) == [
        (1, 0.0, 10.0),
        (2, 0.0, 20.0),
    ]


def test_priority_sample_is_rerun_and_partitioning_stable(spark):
    from another_map_reduce_spark.operators.datapipe import priority_sample

    rows = [(i, i % 7 + 1) for i in range(100)]
    a = priority_sample(
        spark.createDataFrame(rows, ["id", "w"]).repartition(13),
        F.col("id"),
        F.col("w"),
        k=10,
    ).collect()
    b = priority_sample(
        spark.createDataFrame(rows, ["id", "w"]).coalesce(1),
        F.col("id"),
        F.col("w"),
        k=10,
    ).collect()
    assert a == b


# ---------------------------------------------------------------------------
# Round-10 wave-3: compaction planner + temperature mixture sampling
# ---------------------------------------------------------------------------


def test_compaction_bins_are_contiguous_and_cover(spark, sf_dir):
    from another_map_reduce_spark.plans.datapipe import (
        _COMPACT_TARGET_ROWS,
        compaction_bin_packing,
    )

    rows = compaction_bin_packing(spark, sf_dir).collect()
    li_rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # full coverage: every lineitem row lands in exactly one bin
    assert sum(r.bin_rows for r in rows) == li_rows
    # bins are contiguous from 0 and day-ranges don't interleave
    assert [r.bin for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a.last_day < b.first_day
    # offset-binning invariant: through every non-final bin the running
    # total has crossed the next target multiple (a bin only closes
    # because the offset crossed it)
    run = 0
    for r in rows[:-1]:
        run += r.bin_rows
        assert run >= (r.bin + 1) * _COMPACT_TARGET_ROWS


def test_temperature_sample_quota_math_and_determinism(spark, sf_dir):
    import math

    from another_map_reduce_spark.plans.datapipe import (
        _MIX_TARGET_DOCS,
        domain_temperature_sample,
    )

    rows = domain_temperature_sample(spark, sf_dir).collect()
    assert rows, "no domains"
    tw = sum(r.w for r in rows)
    for r in rows:
        # integer-exact weight and quota
        assert r.w == math.isqrt(r.n_docs)
        assert r.quota == (_MIX_TARGET_DOCS * r.w) // tw
        # the pick fills the quota whenever the domain is big enough
        assert r.n_sampled == min(r.quota, r.n_docs)
    # never oversamples the target
    assert sum(r.quota for r in rows) <= _MIX_TARGET_DOCS
    # rerun-determinism: the exact SET of sampled ids is stable
    again = domain_temperature_sample(spark, sf_dir).collect()
    assert [(r.source, r.sum_sampled_ids) for r in rows] == [
        (r.source, r.sum_sampled_ids) for r in again
    ]
