"""Distributed BPE trainer (operators/bpe.py) vs an independent
pure-Python reference implementation of Sennrich et al.'s learn_bpe
loop — the operator-level proof the oracle differential can't give
(the oracle shares the fold construction; this reference doesn't)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from another_map_reduce_spark.operators.bpe import (
    bpe_init_vocab,
    bpe_pair_counts,
    bpe_train,
    merge_fold,
)


def _ref_bpe(word_counts: dict[str, int], n: int) -> list[tuple]:
    """Reference learn_bpe: tuple-of-symbols words, greedy left-to-right
    merge application, (count DESC, a, b) tie-break."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = cnt
        vocab = new_vocab
        tokens = sum(len(s) * c for s, c in vocab.items())
        merges.append((a, b, c, tokens))
    return merges


def test_bpe_train_matches_reference(spark):
    corpus = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest",
        "widest widest banana bananas",
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    vocab = bpe_init_vocab(docs)
    got, final_vocab = bpe_train(vocab, 6)

    wc = Counter(w for line in corpus for w in line.split())
    want = _ref_bpe(dict(wc), 6)
    assert [
        (m["sym_a"], m["sym_b"], m["pair_count"], m["tokens_after"])
        for m in got
    ] == want

    # the final vocab's sequences re-split into symbols that concatenate
    # back to the original words (merge application loses nothing)
    for r in final_vocab.collect():
        assert "".join(r.seq.split(" ")) == r.word


def test_merge_fold_greedy_semantics(spark):
    """Greedy left-to-right fold edge cases: overlapping occurrences
    take the left one; symbol-boundary confusions (a prefix of a longer
    symbol) never match."""
    cases = [
        ("a b a b", "a", "b", "ab ab"),
        ("a a a a a", "a", "a", "aa aa a"),
        ("x a b c", "a", "b", "x ab c"),
        ("a bc", "a", "b", "a bc"),  # 'b' is a prefix of symbol 'bc'
        ("ab c", "b", "c", "ab c"),  # 'b' is a suffix of symbol 'ab'
        ("q", "a", "b", "q"),  # single symbol: fold is the seed
    ]
    df = spark.createDataFrame(
        [(s, a, b, w) for s, a, b, w in cases], ["seq", "a", "b", "want"]
    )
    for r in df.collect():
        out = (
            spark.range(1)
            .select(merge_fold(F.lit(r.seq), r.a, r.b).alias("m"))
            .collect()[0]
            .m
        )
        assert out == r.want, (r.seq, r.a, r.b, out)


def test_pair_counts_weighted(spark):
    vocab = bpe_init_vocab(
        spark.createDataFrame([("aa aa ab",)], ["text"])
    )
    counts = {
        (r.a, r.b): r.c for r in bpe_pair_counts(vocab).collect()
    }
    # 'aa' appears twice (weight 2), 'ab' once
    assert counts == {("a", "a"): 2, ("a", "b"): 1}


def test_encode_accounting_consistency(spark):
    """Per-word token counts from the final vocab reconcile with the
    trainer's tokens_after total, and chars are conserved."""
    corpus = ["aaab aaab aaab cab cab", "aaab dab dab"]
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    merges, final_vocab = bpe_train(bpe_init_vocab(docs), 3)
    rows = final_vocab.collect()
    total = sum(len(r.seq.split(" ")) * r.cnt for r in rows)
    assert total == merges[-1]["tokens_after"]
    for r in rows:
        assert sum(len(s) for s in r.seq.split(" ")) == len(r.word)


def test_encode_oracle_handles_early_exhaustion(spark, tmp_path):
    """A corpus whose vocabulary fully merges before _BPE_N steps:
    the trainer breaks early and BOTH engines must still produce the
    same encode report (the oracle's padded-winner CTEs pass
    sequences through once no pair remains)."""
    import duckdb
    import pandas as pd

    from another_map_reduce_spark.plans.pipeline import (
        _bpe_encode_oracle,
        bpe_encode_report,
    )

    rows = [(1, "aa aa aa", "en", "s", 8), (2, "aa ab", "en", "s", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    merges, _ = bpe_train(
        bpe_init_vocab(spark.read.parquet(str(tmp_path / "documents.parquet"))),
        8,
    )
    assert len(merges) < 8  # the early-exhaustion premise

    got = (
        bpe_encode_report(spark, str(tmp_path))
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = con.execute(_bpe_encode_oracle()).df()
    pd.testing.assert_frame_equal(
        got.astype({"chars_per_token": float}),
        want.astype({"chars_per_token": float}),
        check_dtype=False,
    )


def test_bpe_batched_cap1_equals_sequential(spark):
    """batch_cap=1 recovers the sequential algorithm exactly: same
    merges in the same order, same pair counts, same token totals."""
    from another_map_reduce_spark.operators.bpe import bpe_train_batched

    corpus = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest",
        "widest widest banana bananas",
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    seq_merges, seq_v = bpe_train(bpe_init_vocab(docs), 6)
    rounds, bat_v = bpe_train_batched(bpe_init_vocab(docs), 6, batch_cap=1)
    assert [r["merges"] for r in rounds] == [
        [(m["sym_a"], m["sym_b"], m["pair_count"])] for m in seq_merges
    ]
    assert [r["tokens_after"] for r in rounds] == [
        m["tokens_after"] for m in seq_merges
    ]
    assert sorted((r.word, r.seq) for r in bat_v.collect()) == sorted(
        (r.word, r.seq) for r in seq_v.collect()
    )


def test_bpe_batched_disjoint_and_accounting(spark):
    """Batched rounds: members are pairwise symbol-disjoint, applied
    counts equal the round's true pair counts (invariance under
    disjoint co-members), token totals decrease by exactly the number
    of greedy applications, and chars are conserved."""
    from another_map_reduce_spark.operators.bpe import bpe_train_batched

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox was quick and the dog was lazy",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump over lazy dogs",
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    vocab = bpe_init_vocab(docs)
    base_tokens = vocab.selectExpr(
        "sum(cnt * size(split(seq, ' '))) t"
    ).collect()[0].t
    rounds, final_v = bpe_train_batched(vocab, 12, batch_cap=4)
    assert sum(len(r["merges"]) for r in rounds) == 12
    prev = base_tokens
    for r in rounds:
        syms = [s for (a, b, _) in r["merges"] for s in (a, b)]
        assert len(syms) == len(set(syms)), r  # pairwise disjoint
        assert r["tokens_after"] < prev
        prev = r["tokens_after"]
    for row in final_v.collect():
        assert "".join(row.seq.split(" ")) == row.word


def test_bpe_batched_close_to_sequential_on_corpus(spark, sf_dir):
    """On a REAL corpus (the documents fixture) batched training
    reaches sequential-grade compression: final token totals within
    1% for 32 merges.  (Merge-SET identity is the wrong metric —
    different merge paths legitimately reach the same compression;
    on degenerate tiny corpora whose top pairs all share symbols the
    divergence is large, which is why this runs on real text.)"""
    from another_map_reduce_spark.operators.bpe import bpe_train_batched
    from another_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    seq_merges, _ = bpe_train(bpe_init_vocab(docs), 32)
    rounds, _ = bpe_train_batched(bpe_init_vocab(docs), 32, batch_cap=16)
    assert sum(len(r["merges"]) for r in rounds) == 32
    assert len(rounds) <= 8  # batching actually batched
    seq_tokens = seq_merges[-1]["tokens_after"]
    bat_tokens = rounds[-1]["tokens_after"]
    assert abs(bat_tokens - seq_tokens) / seq_tokens < 0.01, (
        seq_tokens,
        bat_tokens,
    )


def test_incremental_equals_batched(spark, sf_dir):
    """bpe_train_batched_incremental must reproduce bpe_train_batched
    EXACTLY (rounds, merges, counts, token totals) on the real corpus
    — the maintained pair-count frame is a drop-in for the per-round
    recount."""
    from another_map_reduce_spark.operators.bpe import (
        bpe_init_vocab,
        bpe_train_batched,
        bpe_train_batched_incremental,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v = bpe_init_vocab(docs)
    want, vw = bpe_train_batched(v, n_merges=12, batch_cap=4)
    got, vg = bpe_train_batched_incremental(v, n_merges=12, batch_cap=4)
    assert got == want
    assert sorted(map(tuple, vg.collect())) == sorted(map(tuple, vw.collect()))


def test_incremental_counts_match_recount_with_prior_symbol(spark):
    """Crafted corpus where a minted symbol collides with a prior-round
    symbol ('ab' exists before (a,b) is merged): the maintained counts
    must still equal a from-scratch recount after every round."""
    from another_map_reduce_spark.operators.bpe import (
        bpe_init_vocab,
        bpe_pair_counts,
        bpe_train_batched,
        bpe_train_batched_incremental,
    )

    docs = spark.createDataFrame(
        [("abab abab ab a b c abc cab bac abcabc ba",)] * 3
        + [("aabb ccaa bbcc abca cabc",)] * 2,
        "text string",
    )
    v = bpe_init_vocab(docs)
    got, vg = bpe_train_batched_incremental(v, n_merges=6, batch_cap=3)
    want, vw = bpe_train_batched(v, n_merges=6, batch_cap=3)
    assert got == want
    recount = {
        (r.a, r.b): r.c for r in bpe_pair_counts(vg).collect()
    }
    # the final vocab frames agree, so a recount over either equals the
    # maintained state the incremental trainer ended on
    assert recount == {(r.a, r.b): r.c for r in bpe_pair_counts(vw).collect()}
