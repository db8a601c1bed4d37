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
