"""BENCH_SCALE_r10bpe: incremental pair-count maintenance vs per-round
full recount, as the VOCAB FRAME grows.

The r9 verdict's ask: per-round cost independent of the vocab-frame
recount.  The testdata corpus cannot show it — its synthetic documents
have only 31 distinct words, so the (word, cnt, seq) frame is tiny at
every SF and fixed per-job constants dominate (measured: incremental
LOSES there, see the sf0.01 series).  Real corpora have 10^5-10^7
word types; this bench generates deterministic synthetic vocab frames
at 10k/40k/160k types and trains 32 merges (cap 8) both ways,
asserting identical merge tables.  The quantity to watch is
sec_per_round vs vocab size: the batched trainer recounts the whole
frame every round (cost grows with the frame), the incremental one
touches only affected words (cost tracks the merge's support).

Run:  python tools/bench_scale_bpe_incr.py > BENCH_SCALE_r10bpe.json
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from another_map_reduce_spark.operators.bpe import (  # noqa: E402
    bpe_init_vocab,
    bpe_train_batched,
    bpe_train_batched_incremental,
)
from another_map_reduce_spark.session import get_spark  # noqa: E402

_SYL = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
]


def synth_vocab(spark, n_words: int):
    """Deterministic (word, cnt, seq) frame of ``n_words`` distinct
    syllable-composed words with Zipf-ish counts — no randomness, so
    reruns measure the same workload."""
    words = []
    i = 0
    while len(words) < n_words:
        a, b, c, d = (
            i % 20, (i // 20) % 20, (i // 400) % 20, (i // 8000) % 20
        )
        w = _SYL[a] + _SYL[b] + _SYL[c] + (_SYL[d] if i >= 8000 else "")
        if i >= 160_000:
            w += _SYL[(i // 160_000) % 20]
        words.append((w, (i % 97) + 1))
        i += 1
    df = spark.createDataFrame(words, "word string, cnt long")
    return df.select(
        "word",
        "cnt",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
    ).repartition(spark.sparkContext.defaultParallelism)


def run_pair(vocab, n_merges: int, cap: int) -> dict:
    t0 = time.time()
    rb, _ = bpe_train_batched(vocab, n_merges=n_merges, batch_cap=cap)
    tb = time.time() - t0
    t0 = time.time()
    ri, _ = bpe_train_batched_incremental(
        vocab, n_merges=n_merges, batch_cap=cap
    )
    ti = time.time() - t0
    assert ri == rb, "incremental != batched"
    done = sum(len(r["merges"]) for r in ri)
    return {
        "merges": done,
        "rounds": len(ri),
        "batched_recount_sec": round(tb, 2),
        "incremental_sec": round(ti, 2),
        "batched_sec_per_round": round(tb / len(rb), 3),
        "incremental_sec_per_round": round(ti / len(ri), 3),
        "speedup": round(tb / ti, 2),
    }


def main() -> None:
    spark = get_spark(app_name="bench-bpe-incr")
    series = {}
    for n_words in (10_000, 40_000, 160_000, 640_000):
        v = synth_vocab(spark, n_words).localCheckpoint(eager=True)
        series[f"vocab{n_words}"] = {"n_words": n_words} | run_pair(
            v, n_merges=32, cap=8
        )
        print(f"vocab={n_words}: {series[f'vocab{n_words}']}", file=sys.stderr)
    # the production regime: a LONG run where later rounds' merges are
    # rare (small affected sets) — the incremental win compounds there
    v = synth_vocab(spark, 160_000).localCheckpoint(eager=True)
    series["vocab160000_long256"] = {"n_words": 160_000} | run_pair(
        v, n_merges=256, cap=32
    )
    print(f"long256: {series['vocab160000_long256']}", file=sys.stderr)
    # the testdata fixture for context (31 word types — constants win)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    v = bpe_init_vocab(docs).localCheckpoint(eager=True)
    series["sf0.01_fixture_31types"] = run_pair(v, n_merges=32, cap=8)
    print(json.dumps({
        "metric": "bpe_incremental_counts_vs_vocab_size",
        "unit": "sec",
        "note": "identical merge tables asserted per run; incremental "
                "maintains the pair-count frame from affected words only "
                "- wins grow with vocab-frame size, constants win on the "
                "31-type fixture",
        "series": series,
    }, indent=1))


if __name__ == "__main__":
    main()
