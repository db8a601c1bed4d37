"""Corpus-quality filtering and mixing — [extension] (driver north star).

The document-level gates and corpus-level mixing stats a training-data
pipeline applies between raw crawl and training shards:

* Gopher/C4 rule filter — per-document boolean gates from Rae et al.
  2021 (Gopher, Appendix A1.1) and Raffel et al. 2020 (C4 §2.2):
  word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  alphabetic-word ratio, stopword floor, brace ban.  Each rule is its
  own flag column so downstream consumers can re-weight instead of
  hard-drop.
* Domain mix report — per-source token counts, shares and temperature-
  scaled sampling weights (the mixture table a loader samples from;
  cf. The Pile / DoReMi data-mixing setups).

Everything is pure Column expressions over whitespace tokens —
JVM-side, whole-stage codegen, no UDFs, no shuffle beyond the final
aggregations — and every rule is replayable in ANSI/DuckDB SQL, so the
driver hash-checks the full report cross-engine.

The reference has no counterpart (`/root/reference/src/worker.rs:23-38`
is count-by-key only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's "must contain ≥2 of" stopword list (Rae et al. 2021, A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Rule thresholds — Gopher A1.1 values except the word-count floor,
# which is lowered 50 → 20 because the synthetic corpus median is ~40
# words; the *rule shapes* are what we implement, thresholds are config.
MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_RATIO = 0.80
MIN_STOPWORD_HITS = 2

# Temperature for domain-mix sampling weights (share^T / Σ share^T);
# interpolated into the oracle SQL as well, so the two can't drift.
MIX_TEMPERATURE = 0.5


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens, empty tokens elided; [] for blank/empty or
    all-whitespace docs.  ``trim`` strips only spaces (same in DuckDB),
    so the empty-token filter — not the trim — is what guarantees
    tab/newline-padded docs tokenize correctly.  Matches the SQL twin
    ``list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')``.
    """
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append per-document quality metrics + one boolean column per
    Gopher/C4 rule + ``pass_all``.

    Token metrics are computed once into a ``tokens`` projection and
    every rule reads from it, so the text is tokenized exactly once
    per row regardless of rule count (Catalyst collapses the
    projections but `tokens` is a single split call by construction).
    """
    toks = _ws_tokens(F.col(text_col))
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    # exact integer char total → every derived mean is a single division
    # of exact ints, bit-identical in any engine (no float-sum order).
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_wlen = word_chars.cast("double") / nw
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_symbol_words = F.size(
        F.filter(toks, lambda t: t.rlike("#|\\.\\.\\."))
    )
    n_stop = F.size(
        F.filter(
            toks,
            lambda t: F.lower(t).isin(*GOPHER_STOPWORDS),
        )
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("word_chars", word_chars)
        .withColumn("mean_word_len", F.round(mean_wlen, 6))
        .withColumn("alpha_word_ratio", F.round(n_alpha_words / nw, 6))
        .withColumn("symbol_word_ratio", F.round(n_symbol_words / nw, 6))
        .withColumn("stopword_hits", n_stop)
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS),
        "ok_mean_word_len": (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN),
        "ok_alpha_words": F.col("alpha_word_ratio") >= MIN_ALPHA_WORD_RATIO,
        "ok_symbol_ratio": F.col("symbol_word_ratio") <= MAX_SYMBOL_RATIO,
        "ok_stopwords": F.col("stopword_hits") >= MIN_STOPWORD_HITS,
        "ok_no_braces": ~F.col(text_col).contains("{"),
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    pass_all = None
    for name in rules:
        pass_all = F.col(name) if pass_all is None else pass_all & F.col(name)
    return out.withColumn("pass_all", pass_all)


# The same rules as one ANSI-SQL scalar fragment set, for oracle replay.
_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"
)


def gopher_flags_sql_columns() -> str:
    """SELECT fragment computing the identical metric/flag columns in
    DuckDB (list lambdas mirror the Column HOFs 1:1)."""
    toks = _SQL_TOKENS
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
  len({toks}) AS n_words,
  CAST(coalesce(list_sum(list_transform({toks}, t -> length(t))), 0) AS BIGINT)
      AS word_chars,
  round(coalesce(list_sum(list_transform({toks}, t -> length(t))), 0)::DOUBLE
        / greatest(len({toks}), 1), 6) AS mean_word_len,
  round(len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))
        / greatest(len({toks}), 1)::DOUBLE, 6) AS alpha_word_ratio,
  round(len(list_filter({toks}, t -> regexp_matches(t, '#|\\.\\.\\.')))
        / greatest(len({toks}), 1)::DOUBLE, 6) AS symbol_word_ratio,
  len(list_filter({toks}, t -> lower(t) IN ({stop_list}))) AS stopword_hits
""".strip()


def gopher_pass_sql_predicate() -> str:
    """WHERE-clause fragment over the ``gopher_flags_sql_columns()``
    output columns (+ raw ``text``), true iff every rule passes —
    generated from the same constants as the Spark flags so the two
    engines cannot drift."""
    return (
        f"n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} "
        f"AND mean_word_len >= {MIN_MEAN_WORD_LEN} "
        f"AND mean_word_len <= {MAX_MEAN_WORD_LEN} "
        f"AND alpha_word_ratio >= {MIN_ALPHA_WORD_RATIO} "
        f"AND symbol_word_ratio <= {MAX_SYMBOL_RATIO} "
        f"AND stopword_hits >= {MIN_STOPWORD_HITS} "
        "AND NOT contains(text, '{')"
    )


def domain_mix_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    temperature: float = MIX_TEMPERATURE,
) -> DataFrame:
    """Per-domain mixture table: docs, whitespace-token counts, corpus
    share, and temperature-scaled sampling weight
    ``share^T / Σ share^T`` (T=0.5 upsamples small domains — the
    standard multilingual/multi-domain smoothing).

    The corpus is read and shuffled exactly ONCE (the groupBy(domain)
    agg); totals come from an unpartitioned window over the
    |domains|-row aggregate — a single-partition exchange of a few
    rows, never a second corpus scan.  The weight uses the identity
    ``share^T / Σ share^T == n^T / Σ n^T`` so it is computed from the
    EXACT integer token counts (cross-engine-stable doubles).
    """
    from pyspark.sql.window import Window

    per = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_ws_tokens(F.col(text_col)))).alias("n_tokens"),
    )
    everything = Window.partitionBy()
    scaled = F.pow(F.col("n_tokens"), F.lit(temperature))
    # one projection layer: totals from plain columns (no window
    # nested inside a window argument).  The scaled total is a DOUBLE
    # sum, so a plain window SUM would be row-order dependent in the
    # last ulps; fold a value-sorted list instead — a canonical
    # ascending-order left fold both engines can reproduce bit-for-bit
    # (the oracle sums `list(... ORDER BY ...)` the same way).  The
    # list is |domains| rows, already post-aggregate.
    with_tot = per.select(
        "*",
        F.sum("n_tokens").over(everything).alias("_tot_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(scaled).over(everything)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_tot_scaled"),
    )
    return with_tot.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("_tot_tokens"), 6).alias(
            "token_share"
        ),
        F.round(scaled / F.col("_tot_scaled"), 6).alias("mix_weight"),
    ).orderBy(group_col)
