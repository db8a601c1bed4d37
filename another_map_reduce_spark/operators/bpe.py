"""Distributed BPE tokenizer training — [extension].

Byte-pair-encoding merge-table learning (Sennrich, Haddow & Birch,
ACL 2016, `learn_bpe`): start from the character sequence of every
corpus word, repeatedly count adjacent symbol pairs (weighted by word
frequency) and merge the most frequent pair everywhere.  The learned
merge table IS the tokenizer — training it is a standard LLM-pipeline
job the reference cannot express (its only aggregate is count-by-key,
`/root/reference/src/worker.rs:36-38`).

Distributed shape — the part that matters at 100 TB:

* the corpus is scanned ONCE, collapsing to the (word, count) vocab
  frame; every later iteration touches only that frame (types, not
  tokens — orders of magnitude smaller, still distributed);
* each merge iteration is one vocab-sized pair-count shuffle plus a
  map-side fold applying the winning merge; the only driver action is
  the 1-row argmax winner per iteration (same bounded-collect budget
  as graph.connected_components' convergence probe);
* lineage is checkpointed per iteration so N merges cost N shallow
  plans, not one 2^N-deep expression tree.

Determinism: pair counts are integer sums; the winner tie-breaks on
(count DESC, sym_a, sym_b) — a total order.  The greedy left-to-right
merge application is a fold with a space-delimited string accumulator,
spelled identically in Spark (`F.aggregate`) and the DuckDB oracle
(`list_reduce`, which seeds from the first element — Spark mirrors
that seeding so the two folds are the same function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_occurrences(
    docs: DataFrame, text_col: str = "text", *extra_cols: str
) -> DataFrame:
    """One row per lowercase-alpha word OCCURRENCE (plus any requested
    passthrough columns) — the single tokenization definition shared
    by the trainer's vocab build and the encoder's corpus join, so the
    two can never drift character-wise."""
    return docs.select(
        *extra_cols,
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", " "),
                " ",
            )
        ).alias("word"),
    ).where(F.col("word") != "")


def bpe_init_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, seq) vocab frame: lowercase alpha words with corpus
    counts; ``seq`` is the word's symbol sequence as a space-joined
    string, initially one character per symbol."""
    words = (
        word_occurrences(docs, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return words.select(
        "word",
        "cnt",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
    )


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol-pair counts (a, b, c) over
    the vocab frame — one vocab-sized shuffle."""
    s = F.split("seq", " ")
    idx = F.sequence(F.lit(1), F.size(s) - 1)
    prs = F.when(
        F.size(s) >= 2,
        F.transform(
            idx,
            lambda j: F.struct(
                F.element_at(s, j).alias("a"),
                F.element_at(s, j + 1).alias("b"),
            ),
        ),
    ).otherwise(F.lit(None).cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select("cnt", F.explode(prs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("c"))
    )


def merge_fold(seq: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b) to a
    space-delimited symbol string — the exact `learn_bpe` replacement
    semantics: a fold whose accumulator is the merged prefix, merging
    when the last emitted symbol is exactly ``a`` and the next is
    ``b`` (so overlapping occurrences resolve left-first)."""
    s = F.split(seq, " ")

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (x == F.lit(b))
            & ((acc == F.lit(a)) | acc.endswith(F.lit(" " + a))),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - len(a)),
                F.lit(a + b),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    return F.aggregate(
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        F.element_at(s, 1),
        step,
    )


def bpe_train(
    vocab: DataFrame, n_merges: int
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merge table rows, final
    vocab frame).  Each row: step, sym_a, sym_b, pair_count,
    tokens_after (total corpus symbol instances after the merge)."""
    v = vocab.localCheckpoint(eager=True)
    merges: list[dict] = []
    for step_no in range(1, n_merges + 1):
        top = (
            bpe_pair_counts(v)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:  # every word fully merged — corpus exhausted
            break
        a, b, c = top[0].a, top[0].b, top[0].c
        v = v.withColumn("seq", merge_fold(F.col("seq"), a, b))
        v = v.localCheckpoint(eager=True)
        tokens_after = v.select(
            F.sum(F.col("cnt") * F.size(F.split("seq", " "))).alias("t")
        ).collect()[0].t
        merges.append(
            {
                "step": step_no,
                "sym_a": a,
                "sym_b": b,
                "pair_count": int(c),
                "tokens_after": int(tokens_after),
            }
        )
    return merges, v
