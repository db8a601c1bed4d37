"""Text analysis operators — [extension] (SURVEY.md §2b, driver north star).

Language-ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting over a text
column.  All pure Column expressions — JVM-side, codegen-friendly, no
Python in the row path — so they run at scan speed over 100 TB and the
only shuffle in a typical stats query is the final small aggregation.

Determinism: every expression here has an exact DuckDB equivalent
(same regexes, same integer arithmetic, double divisions of identical
operands), so all of these are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: alpha runs | single digits | single symbols.
# (The shape GPT-2-style byte-BPE pre-splitting produces, minus byte
# merges — a deterministic, library-free approximation.)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Tiny fixed stopword lists for the heuristic language identifier.
# Deliberately minimal: deterministic, embeddable in SQL, and enough
# to separate the five corpus languages on real text.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "je"),
    "de": ("der", "die", "das", "und", "ist", "ich", "ein", "eine", "zu", "nicht"),
    "es": ("el", "los", "las", "de", "y", "un", "una", "es", "que", "en"),
    "zh": ("的", "了", "是", "我", "不", "在", "人", "有", "他", "这"),
}
# Fixed priority order breaks score ties deterministically.
LANG_PRIORITY: tuple[str, ...] = ("en", "fr", "de", "es", "zh")


def _ws_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (empty-token free)."""
    return F.array_remove(F.split(F.lower(text), r"\s+"), "")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(_ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def alpha_char_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^A-Za-z]", ""))


def punct_char_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(
        F.filter(
            _ws_tokens(text),
            lambda t: t.isin(*words),
        )
    )


def lang_case_from_hits(hits: dict[str, Column]) -> Column:
    """Argmax-with-priority CASE chain over precomputed hit columns.

    Separate from hit computation so callers can materialise the hits
    in a projection first — inlining all five ``size(filter(split))``
    expressions into every CASE branch re-tokenizes the text ~25×.
    """
    expr = F.lit("und")
    # build the CASE chain in reverse priority so earlier langs win ties
    for lang in reversed(LANG_PRIORITY):
        cond = hits[lang] > 0
        for other in LANG_PRIORITY:
            if other == lang:
                break
            cond = cond & (hits[lang] > hits[other])  # strictly beat earlier
        for other in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]:
            cond = cond & (hits[lang] >= hits[other])  # tie-beat later
        expr = F.when(cond, lang).otherwise(expr)
    return expr


def detect_language(text: Column) -> Column:
    """Heuristic language ID: argmax stopword hits, 'und' when zero.

    Ties break by LANG_PRIORITY order.  A classic n-gram model would
    need training data; stopword voting is the deterministic,
    SQL-expressible core of the same idea.

    Single-expression form (convenient but re-tokenizes per branch);
    for bulk scoring prefer a projection of hit columns +
    ``lang_case_from_hits`` (see plans/pipeline.lang_id_confusion).
    """
    return lang_case_from_hits(
        {lang: stopword_hits(text, lang) for lang in LANG_PRIORITY}
    )


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, ~1]: length, alpha share,
    punctuation penalty, English-stopword share.

    Weights are arbitrary but fixed; all arithmetic is double ops over
    identical operands in any engine, so the score is reproducible.
    """
    n_chars = F.length(text).cast("double")
    n_tokens = ws_token_count(text).cast("double")
    alpha_ratio = alpha_char_count(text) / F.greatest(n_chars, F.lit(1.0))
    punct_ratio = punct_char_count(text) / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stopword_hits(text, "en") / F.greatest(n_tokens, F.lit(1.0))
    length_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    return (
        F.lit(0.3) * length_score
        + F.lit(0.4) * alpha_ratio
        + F.lit(0.2) * stop_ratio
        - F.lit(0.1) * punct_ratio
    )


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: md5 of lowercased text with
    whitespace runs collapsed and trimmed.

    md5 (not a rolling hash) so the value is reproducible in any
    engine; collisions are irrelevant at fingerprinting's 128-bit width.
    """
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized.cast("binary"))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame: the full analysis battery in one pass."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).alias("n_chars_actual"),
        ws_token_count(t).alias("n_tokens_ws"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        alpha_char_count(t).alias("n_alpha"),
        punct_char_count(t).alias("n_punct"),
        detect_language(t).alias("pred_lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )
