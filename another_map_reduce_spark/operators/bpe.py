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
    tokens_after (total corpus symbol instances after the merge).

    ONE distributed aggregation per merge: the winner is
    ``min(struct(-c, a, b))`` (≡ the (count DESC, a, b) tie-break) and
    the SAME pass's ``sum(c)`` yields the corpus token total through
    the identity  Σ_w cnt·len(seq_w) = Σ_pairs c + Σ_w cnt  (every
    word of length L contributes exactly L−1 adjacent pairs), so
    ``tokens_after`` for merge k is read off merge k+1's pair pass —
    no separate reporting job per iteration.  Σ cnt is merge-invariant
    and computed once."""
    v = vocab.localCheckpoint(eager=True)
    w_total = int(v.agg(F.sum("cnt")).collect()[0][0] or 0)
    merges: list[dict] = []
    pending: dict | None = None  # awaits tokens_after from the next pass
    for step_no in range(1, n_merges + 1):
        agg = (
            bpe_pair_counts(v)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("a"), F.col("b")
                    )
                ).alias("w"),
                F.sum("c").alias("tot"),
            )
            .collect()[0]
        )
        tokens_now = int(agg.tot or 0) + w_total
        if pending is not None:
            pending["tokens_after"] = tokens_now
            merges.append(pending)
            pending = None
        if agg.w is None:  # every word fully merged — corpus exhausted
            break
        a, b, c = agg.w.a, agg.w.b, -agg.w.nc
        pending = {
            "step": step_no,
            "sym_a": a,
            "sym_b": b,
            "pair_count": int(c),
        }
        v = v.withColumn("seq", merge_fold(F.col("seq"), a, b))
        v = v.localCheckpoint(eager=True)
    if pending is not None:  # final merge: one extra bounded pass
        tot = bpe_pair_counts(v).agg(F.sum("c")).collect()[0][0]
        pending["tokens_after"] = int(tot or 0) + w_total
        merges.append(pending)
    return merges, v


def bpe_train_batched(
    vocab: DataFrame, n_merges: int, batch_cap: int = 32
) -> tuple[list[dict], DataFrame]:
    """Batched BPE training: per ROUND, one pair-count pass ranks the
    top candidates and a greedy selection of PAIRWISE SYMBOL-DISJOINT
    pairs (up to ``batch_cap``, ranked order, conflicting pairs
    skipped to the next round) is applied in one composed fold pass —
    so N merges cost ≈ N/batch ranking shuffles instead of N.

    Symbol-disjointness makes batch members' counts invariant under
    each other's application (a merge only creates/destroys
    adjacencies involving its own symbols), so every applied
    (pair, count) is exactly what sequential BPE counted this round.
    Disjointness covers the MINTED symbol as well: a candidate whose
    symbol equals the concatenation a+b of an earlier-chosen pair is
    skipped, because applying (a, b) mints new 'ab' tokens whose
    adjacencies the candidate's count never saw.
    The REMAINING divergence from sequential training: a pair newly
    created by an earlier batch member (count ≤ its creator's) can
    rank above a later batch member and would have been merged first
    by the sequential trainer.  That reordering is the standard
    large-vocab engineering tradeoff; ``batch_cap=1`` recovers the
    sequential algorithm exactly (pytest-pinned), and tests compare
    the two merge tables on real text.

    Returns (rounds, final vocab); each round row: round, merges =
    [(sym_a, sym_b, pair_count), ...] in applied order, tokens_after.
    """
    v = vocab.localCheckpoint(eager=True)
    rounds: list[dict] = []
    done = 0
    round_no = 0
    while done < n_merges:
        want = min(batch_cap, n_merges - done)
        # Oversample the ranking so skipped (conflicting) candidates
        # don't starve the batch; bounded driver collect.
        top = (
            bpe_pair_counts(v)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(max(4 * want, 16))
            .collect()
        )
        if not top:
            break
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            if len(chosen) >= want:
                break
            if r.a in used or r.b in used:
                continue
            chosen.append((r.a, r.b, int(r.c)))
            # Reserve the MINTED symbol too: if 'ab' already exists as
            # a corpus symbol (from a prior round), applying (a, b)
            # mints NEW 'ab' tokens whose adjacencies a later batch
            # member (ab, c) never counted — admitting it would break
            # the count-invariance this docstring promises.
            used.update((r.a, r.b, r.a + r.b))
        # The top-ranked candidate always qualifies → progress is
        # guaranteed every round.
        expr: Column = F.col("seq")
        for j, (a, b, _) in enumerate(chosen):
            expr = merge_fold(expr, a, b)
            # Chunk the fold composition: 4 nested aggregates per
            # projection (measured knee — deeper nesting blows up
            # Catalyst planning time super-linearly); chained
            # projections stay one narrow (pipelined) stage.
            if (j + 1) % 4 == 0 or j + 1 == len(chosen):
                v = v.withColumn("seq", expr)
                expr = F.col("seq")
        v = v.localCheckpoint(eager=True)
        tokens_after = int(
            v.agg(
                F.sum(F.col("cnt") * F.size(F.split("seq", " ")))
            ).collect()[0][0]
            or 0
        )
        round_no += 1
        done += len(chosen)
        rounds.append(
            {
                "round": round_no,
                "merges": chosen,
                "tokens_after": tokens_after,
            }
        )
    return rounds, v


def pair_adjacency_pred(seq: Column, pairs: list[tuple[str, str]]) -> Column:
    """True iff the space-joined symbol string contains an (a, b)
    adjacency for ANY pair in ``pairs`` — a pure substring test on the
    space-padded string (symbols contain no spaces, so ``" a b "`` in
    ``" " + seq + " "`` ⟺ adjacent symbols a, b; no regex engine, no
    tokenization)."""
    pad = F.concat(F.lit(" "), seq, F.lit(" "))
    pred = F.lit(False)
    for a, b, *_ in pairs:
        pred = pred | pad.contains(f" {a} {b} ")
    return pred


def bpe_train_batched_incremental(
    vocab: DataFrame, n_merges: int, batch_cap: int = 32
) -> tuple[list[dict], DataFrame]:
    """``bpe_train_batched`` with INCREMENTAL pair-count maintenance —
    the r10 lever for real 30k-merge vocabularies: instead of
    recounting every adjacent pair of the whole vocab frame each round
    (the recount is one full-frame explode+shuffle whose cost never
    shrinks), the (a, b, c) pair-count frame is kept as ROUND STATE
    and updated from only the AFFECTED words:

        counts' = counts  −  pairs(affected words, before)
                          +  pairs(affected words, after)

    where ``affected`` = words containing an adjacency of any chosen
    pair (an exact substring predicate — pair_adjacency_pred).  Full
    symbol-disjointness (including the minted a+b symbol) makes the
    batch members non-interacting, so a word changes iff it matches
    that predicate, and the update is EXACT: the maintained frame
    equals a from-scratch recount bit-for-bit (pytest-pinned; the
    registered query's oracle RE-derives every round's ranking from a
    recount, so a drifted maintained count flips the hash).

    Per-round distributed cost: one narrow substring filter over the
    cached vocab blocks + one pair aggregation over the affected
    subset + one counts-frame merge — the full-frame explode recount
    and the full-frame token total are both gone (tokens_after falls
    out of the maintained counts through the Σ cnt·len = Σ c + Σ cnt
    identity).  As merges rarefy (later rounds touch ever-fewer
    words), per-round cost tracks |affected|, not |vocab|.

    Same return shape and selection semantics as ``bpe_train_batched``
    (identical output, pytest-pinned).
    """
    v = vocab.localCheckpoint(eager=True)
    w_total = int(v.agg(F.sum("cnt")).collect()[0][0] or 0)
    counts = bpe_pair_counts(v).localCheckpoint(eager=True)
    rounds: list[dict] = []
    done = 0
    round_no = 0
    while done < n_merges:
        want = min(batch_cap, n_merges - done)
        top = (
            counts.orderBy(F.col("c").desc(), "a", "b")
            .limit(max(4 * want, 16))
            .collect()
        )
        if not top:
            break
        chosen: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            if len(chosen) >= want:
                break
            if r.a in used or r.b in used:
                continue
            chosen.append((r.a, r.b, int(r.c)))
            used.update((r.a, r.b, r.a + r.b))
        pred = pair_adjacency_pred(F.col("seq"), chosen)
        affected = v.where(pred)
        old_pairs = bpe_pair_counts(affected).select(
            "a", "b", (-F.col("c")).alias("c")
        )
        expr: Column = F.col("seq")
        new_affected = affected
        for j, (a, b, _) in enumerate(chosen):
            expr = merge_fold(expr, a, b)
            if (j + 1) % 4 == 0 or j + 1 == len(chosen):
                new_affected = new_affected.withColumn("seq", expr)
                expr = F.col("seq")
        new_affected = new_affected.localCheckpoint(eager=True)
        new_pairs = bpe_pair_counts(new_affected)
        # eager=False + the token-total aggregate below: ONE job both
        # materialises the round's counts blocks and sums them (the
        # connected_components convergence-probe discipline)
        counts = (
            counts.unionByName(old_pairs)
            .unionByName(new_pairs)
            .groupBy("a", "b")
            .agg(F.sum("c").alias("c"))
            .where(F.col("c") != 0)
            .localCheckpoint(eager=False)
        )
        # unaffected words pass through untouched — no fold, no
        # shuffle; lazily checkpointed (next round's first use
        # materialises the blocks).  coalesce caps the union's
        # partition count (unaffected P + affected P would otherwise
        # DOUBLE per round — 2^rounds tasks by round 10, measured);
        # narrow, so still no shuffle.
        par = v.sparkSession.sparkContext.defaultParallelism
        v = (
            v.where(~pred)
            .unionByName(new_affected)
            .coalesce(par)
            .localCheckpoint(eager=False)
        )
        tokens_after = (
            int(counts.agg(F.sum("c")).collect()[0][0] or 0) + w_total
        )
        round_no += 1
        done += len(chosen)
        rounds.append(
            {
                "round": round_no,
                "merges": chosen,
                "tokens_after": tokens_after,
            }
        )
    return rounds, v
