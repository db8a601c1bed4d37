"""Frequency sketches — [extension]: sketch-then-verify heavy hitters.

Misra–Gries (1982) keeps k counters per partition and is MERGEABLE
(Agarwal et al., "Mergeable Summaries", PODS 2012): an item absent from
EVERY partition's sketch has global count ≤ Σ n_p/(k+1) = n/(k+1), so
the union of per-partition candidates provably contains every item
with global frequency > n/(k+1).  With k ≥ 1/θ the candidate set
covers all θ-heavy hitters, and an exact recount join turns the
approximate sketch into an EXACT answer — the standard two-phase
scale pattern (sketch prunes the long tail; the recount shuffles only
candidate-matched rows).

The reference has no sketch surface (its whole query capability is
count-by-key, `/root/reference/src/worker.rs:23-38`).

Spark shape: ONE corpus scan through an Arrow-batched mapInPandas
that maintains the MG dict across batches within a partition and
emits ≤ k candidate words per partition; candidates are tiny →
broadcast back against the exploded corpus for the exact recount
(second scan, one small shuffle).  Python touches ≤ k rows of output
per partition — the heavy data path stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_sketch(
    words: DataFrame, k: int, word_col: str = "word"
) -> DataFrame:
    """Per-partition Misra–Gries sketch with ``k`` counters, emitted as
    (word, pcount) rows: ≤ k candidate rows per partition (pcount
    NULL) plus ONE partition-size row (word NULL) — so the same single
    scan yields both the candidate set and the exact corpus total.
    The candidate union is a guaranteed superset of every word with
    global count > n/(k+1), n counting NON-NULL words only: NULL words
    are filtered before the scan (the word=NULL row is the partition
    sentinel, so a null key would be unreportable; every caller
    explodes non-null tokens, making the filter a no-op in practice).

    Vectorized form of the classic per-token loop: each Arrow batch is
    counted exactly with ``Series.value_counts()`` (C speed), the batch
    counts merge into the running summary (per-UNIQUE-word Python cost,
    not per-token), and the summary is re-pruned to k counters by
    subtracting the (k+1)-th largest count — the mergeable-summaries
    merge (Agarwal et al., PODS 2012, Fig. 1), which preserves the
    n/(k+1) capture bound: an exact batch count is an error-free MG
    summary, merging adds errors, and each prune's subtraction is
    charged to the ≥ k+1 counters it decrements.
    """
    import numpy as np

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_part = 0
        for batch in batches:
            col = batch[word_col]
            n_part += len(col)
            for w, c in col.value_counts(sort=False).items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(
                    counters.values(), dtype=np.int64, count=len(counters)
                )
                # (k+1)-th largest = index len-k-1 ascending; at most k
                # values exceed it, so the survivors fit the summary
                sub = int(np.partition(vals, len(vals) - k - 1)[
                    len(vals) - k - 1
                ])
                counters = {
                    w: c - sub for w, c in counters.items() if c > sub
                }
        yield pd.DataFrame(
            {
                word_col: list(counters.keys()) + [None],
                "pcount": [None] * len(counters) + [n_part],
            }
        )

    return (
        words.select(word_col)
        .where(F.col(word_col).isNotNull())
        .mapInPandas(_mg, schema=f"{word_col} string, pcount long")
    )


def misra_gries_candidates(
    words: DataFrame, k: int, word_col: str = "word"
) -> DataFrame:
    """Distinct candidate words from the per-partition sketch."""
    sk = misra_gries_sketch(words, k, word_col)
    return sk.where(F.col(word_col).isNotNull()).select(word_col).distinct()


def heavy_hitters_exact(
    words: DataFrame, theta: float, word_col: str = "word"
) -> DataFrame:
    """Exact θ-heavy hitters via sketch-then-verify.

    Returns (word, cnt, freq) for every word with count > θ·n, ordered
    by (cnt desc, word).  Correctness does not depend on the sketch:
    with k = ⌈1/θ⌉ counters the Misra–Gries candidate union provably
    contains all θ-heavy hitters, and the recount join computes exact
    counts for the candidates only.
    """
    # Scale boundary of the forced candidate broadcast below: the
    # candidate set is ≤ k × partitions, which stays broadcast-sized
    # for thousands of partitions but not for hundreds of thousands
    # (e.g. k=101 × 200k partitions ≈ 20M strings).  At that scale,
    # insert a merge level first — MG summaries are mergeable, so a
    # groupBy(word) SUM over the sketch rows followed by a top-(k)
    # re-prune collapses candidates back to ≤ k before the recount.
    k = max(int(1.0 / theta) + 1, 1)
    # ONE sketch scan yields candidates AND the exact total (the
    # partition-size rows) — a separate count() would re-tokenize the
    # whole corpus a third time.  The sketch is checkpointed so its
    # two derived frames (candidates, total) read cached rows instead
    # of re-running the corpus scan each.
    sketch = misra_gries_sketch(words, k, word_col).localCheckpoint()
    cands = (
        sketch.where(F.col(word_col).isNotNull()).select(word_col).distinct()
    )
    total = sketch.select(F.sum("pcount").alias("_n"))
    counted = (
        words.join(F.broadcast(cands), word_col)  # candidates are ≤ k·parts
        .groupBy(word_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.join(F.broadcast(total))
        .where(F.col("cnt") > F.lit(theta) * F.col("_n"))
        .select(
            word_col,
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_n"), 6).alias(
                "freq"
            ),
        )
        .orderBy(F.col("cnt").desc(), word_col)
    )


# ---------------------------------------------------------------------------
# KMV / theta distinct sketches — mergeable, with INTERSECTION support
# ---------------------------------------------------------------------------
#
# K-minimum-values (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007)
# keeps the k smallest hash values of the distinct keys.  Like HLL it
# is a mergeable distinct-count summary (union = k smallest of the
# concatenated sketches), but UNLIKE HLL it supports set INTERSECTION
# (the theta-sketch estimator, Dasgupta et al. 2016): restrict both
# sketches to the common sampling threshold θ = min(θ_a, θ_b); every
# retained hash is a uniform θ-rate sample of the underlying set, so
# |A∩B ∩ [0,θ)| / θ estimates |A∩B|.  HLL registers cannot answer
# this without inclusion–exclusion (whose error explodes for small
# intersections) — KMV is the standard remedy.
#
# Everything below is deterministic column arithmetic over
# md5-derived 52-bit hashes, so a DuckDB oracle replays the sketch
# bit-for-bit and the driver hash is EXACT, not a tolerance boolean.
# 52 bits keeps every value exactly representable in a double as well
# as a BIGINT on both engines.

_KMV_BITS = 52
_KMV_SPACE = float(1 << _KMV_BITS)  # 2^52, exact in double


def kmv_hash(key) -> "F.Column":
    """Uniform 52-bit hash of ``key`` as BIGINT: the leading 13 hex
    chars of md5(CAST(key AS STRING)).  Identical SQL spelling:
    ``CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 13) AS BIGINT)``.
    """
    col = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 13), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame, group_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct 52-bit key
    hashes, as a sorted ``array<long>`` column ``sk``.

    Plan shape: ONE distinct shuffle on (group, hash) — exactly the
    exchange an exact COUNT(DISTINCT) needs — then an in-partition
    row_number top-k and a k-bounded collect per group.  The output is
    |groups| rows of ≤ k longs: kilobyte summaries that answer any
    later union/intersection question without re-scanning the corpus,
    the same store-partials contract as hll_sketch_rollup.
    """
    h = kmv_hash(key_col).alias("_h")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        # NULL keys carry no hash and are excluded (as COUNT(DISTINCT)
        # would exclude them); without this a NULL would eat a
        # row_number slot and then vanish from collect_list
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, h)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("sk"))
    )


def kmv_union(a, b, k: int) -> "F.Column":
    """Merged sketch of two KMV arrays: k smallest of the distinct
    union — the mergeable-summaries merge, associative and
    commutative, so sketches roll up across partitions/days freely."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_theta(sk, k: int) -> "F.Column":
    """Sampling threshold θ·2^52 of a sketch: its k-th smallest hash
    when full, else the whole space (the sketch is then exact)."""
    return F.when(
        F.size(sk) >= k, F.element_at(sk, k)
    ).otherwise(F.lit(1 << _KMV_BITS).cast("long"))


def kmv_estimate(sk, k: int) -> "F.Column":
    """Distinct-count estimate: exact |sk| below capacity, else the
    unbiased KMV estimator (k-1)·2^52 / kth-min (Beyer et al. 2007).
    One correctly-rounded double division — bit-stable cross-engine."""
    return F.round(
        F.when(F.size(sk) < k, F.size(sk).cast("double")).otherwise(
            F.lit(float(k - 1) * _KMV_SPACE) / F.element_at(sk, k).cast("double")
        ),
        4,
    )


def theta_intersect_estimate(a, b, k: int) -> "F.Column":
    """Theta-sketch intersection estimate of two KMV arrays: count the
    common hashes below the shared threshold θ = min(θ_a, θ_b), then
    scale by 1/θ.  Exact when both sketches are below capacity."""
    theta = F.least(kmv_theta(a, k), kmv_theta(b, k))
    below = F.size(
        F.filter(F.array_intersect(a, b), lambda x: x < theta)
    )
    return F.round(
        below.cast("double") * F.lit(_KMV_SPACE) / theta.cast("double"), 4
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#
# The missing member of the suite's mergeable-summary family (beside
# Misra–Gries candidates, KMV/theta distinct sketches, HLL, and
# fixed-grid histograms): a d×w integer counter grid answering point
# frequency queries with one-sided error — est(x) ≥ true(x) always,
# est(x) ≤ true(x) + 2n/w with probability ≥ 1 − 2^−d.  Unlike
# Misra–Gries it supports WEIGHTED updates and is a plain integer
# matrix under (+), so per-partition / per-day grids merge by cell
# addition — the store-partials contract every sketch here follows.
#
# Determinism: row-j bucket = md5-derived 52-bit integer of
# 'cms{j}#key' mod width — the kmv_hash idiom, replayable bit-exactly
# in ANSI SQL — and every counter is a BIGINT, so a DuckDB oracle
# hash-matches the estimates EXACTLY, not within a tolerance.

_CMS_DEPTH = 4
_CMS_WIDTH = 512


def cms_bucket(key, row: int, width: int = _CMS_WIDTH) -> "F.Column":
    """Row-``row`` bucket of ``key``: leading 13 hex chars of
    md5('cms{row}#' || key) as BIGINT, mod ``width``.  Identical SQL:
    ``CAST('0x' || substr(md5('cms{row}#' || key), 1, 13) AS BIGINT)
    % width`` (hash ≥ 0, so truncated and floored mod agree)."""
    col = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{row}#"), col.cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> DataFrame:
    """Build the counter grid: (j, b, c) rows, j < depth, b < width.

    Two-level aggregation keeps the sketch build corpus-shaped, not
    sketch-shaped: the raw stream first collapses to (key, count) with
    map-side combine (the one corpus-sized exchange — the same
    exchange an exact GROUP BY needs), then each distinct key explodes
    into ``depth`` (j, bucket) cells and a second tiny shuffle sums
    ≤ depth·width counters.  Weighted streams: pre-aggregate to
    (key, weight) and pass ``weight_col``-shaped input through the
    same explode (the grid is linear, so any (key → weight) frame
    works); this helper takes raw rows for the common count case.
    """
    keyed = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_c"))
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(key_col, j, width).alias("b"),
            )
            for j in range(depth)
        ]
    )
    return (
        keyed.select(F.explode(cells).alias("r"), "_c")
        .groupBy(F.col("r.j").alias("j"), F.col("r.b").alias("b"))
        .agg(F.sum("_c").cast("long").alias("c"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over the
    d counters each probe hashes to (missing cell ⇒ 0 via left join —
    a probe never seen by the build).  The probe frame is tiny by
    construction (a candidate list), so the join broadcasts it against
    the ≤ d·w-row grid; output is (key, cms_est)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(key_col, j, width).alias("b"),
            )
            for j in range(depth)
        ]
    )
    pb = probes.select(key_col, F.explode(cells).alias("r")).select(
        key_col, F.col("r.j").alias("j"), F.col("r.b").alias("b")
    )
    return (
        pb.join(counters, ["j", "b"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )
