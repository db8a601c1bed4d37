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


# ---------------------------------------------------------------------------
# Unicode-robust tokenization face (r10) — the locale-aware twin of the
# ASCII surface above.  The reference-parity tokenizer ([A-Za-z],
# worker.rs:26-29) and the whitespace tokens stay as-is; these variants
# exist because CJK/diacritic text silently degrades the ASCII gates
# (é counts as "punctuation", 中文 has no whitespace).  Java and RE2
# agree on \p{L}/\p{N} classes and on simple case folding for the
# mappings used here (verified bit-identical cross-engine on the
# planted multilingual fixture — unicode_token_stats' oracle row), so
# every function has an exact DuckDB twin.
# ---------------------------------------------------------------------------

UNICODE_TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def unicode_tokens(text: Column, split_cjk: bool = False) -> Column:
    """Lowercased tokens split on any run of non-letter/non-digit
    (Unicode classes, not ASCII ranges): diacritics stay inside
    tokens, CJK codepoints are letters, digits survive.  DuckDB twin:
    ``list_filter(string_split_regex(lower(text),
    '[^\\p{L}\\p{N}]+'), x -> x <> '')``.

    ``split_cjk=True`` first isolates every Han character as its own
    token (``\\p{IsHan}`` → padded; DuckDB twin ``\\p{Han}``, verified
    bit-identical) — unsegmented Chinese has no whitespace, so without
    this a whole sentence is ONE token and the single-character zh
    stopwords can never match; with it, char-level voting works (the
    standard char-unigram fallback for unsegmented scripts)."""
    t = text
    if split_cjk:
        t = F.regexp_replace(t, r"(\p{IsHan})", " $1 ")
    return F.array_remove(F.split(F.lower(t), UNICODE_TOKEN_SPLIT), "")


def unicode_token_count(text: Column) -> Column:
    return F.size(unicode_tokens(text))


def unicode_alpha_char_count(text: Column) -> Column:
    """Letter count under \\p{L} — é, ü, 我 all count (the ASCII
    ``alpha_char_count`` treats them as non-alpha, which is exactly
    the quality-gate degradation this face removes)."""
    return F.length(F.regexp_replace(text, r"[^\p{L}]", ""))


def unicode_punct_char_count(text: Column) -> Column:
    """Characters that are neither letters, digits, nor whitespace —
    the locale-aware punctuation count («», ¿, — are punctuation;
    é is NOT)."""
    return F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))


def stopword_hits(
    text: Column,
    lang: str,
    unicode_mode: bool = False,
    split_cjk: bool = False,
) -> Column:
    """Number of tokens that are stopwords of ``lang``.

    ``unicode_mode=True`` tokenizes with :func:`unicode_tokens`
    instead of whitespace splitting — the opt-in that lets lang-ID see
    stopwords adjacent to punctuation («le» or est-il) and scores
    diacritic text correctly; ``split_cjk=True`` additionally enables
    char-level voting on unsegmented CJK."""
    words = STOPWORDS[lang]
    toks = (
        unicode_tokens(text, split_cjk=split_cjk)
        if unicode_mode
        else _ws_tokens(text)
    )
    return F.size(
        F.filter(
            toks,
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


def detect_language(
    text: Column, unicode_mode: bool = False, split_cjk: bool = False
) -> Column:
    """Heuristic language ID: argmax stopword hits, 'und' when zero.

    Ties break by LANG_PRIORITY order.  A classic n-gram model would
    need training data; stopword voting is the deterministic,
    SQL-expressible core of the same idea.

    ``unicode_mode=True`` votes over :func:`unicode_tokens` — the
    opt-in locale-aware face: French «le» beside guillemets, hyphened
    clitics (est-il), and space-segmented CJK all register, where the
    whitespace tokenizer returns 'und'.

    Single-expression form (convenient but re-tokenizes per branch);
    for bulk scoring prefer a projection of hit columns +
    ``lang_case_from_hits`` (see plans/pipeline.lang_id_confusion).
    """
    return lang_case_from_hits(
        {
            lang: stopword_hits(
                text, lang, unicode_mode=unicode_mode, split_cjk=split_cjk
            )
            for lang in LANG_PRIORITY
        }
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


def quality_score_unicode(text: Column) -> Column:
    """:func:`quality_score` over the Unicode faces — same fixed
    weights, but alpha/punct/token counts are locale-aware, so
    diacritic or CJK text is scored on its content instead of being
    penalized as 'punctuation'.  The opt-in gate variant; the ASCII
    form stays the default (its oracle rows and thresholds are
    calibrated to it)."""
    n_chars = F.length(text).cast("double")
    n_tokens = unicode_token_count(text).cast("double")
    alpha_ratio = unicode_alpha_char_count(text) / F.greatest(
        n_chars, F.lit(1.0)
    )
    punct_ratio = unicode_punct_char_count(text) / F.greatest(
        n_chars, F.lit(1.0)
    )
    stop_ratio = stopword_hits(text, "en", unicode_mode=True) / F.greatest(
        n_tokens, F.lit(1.0)
    )
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


# DuckDB twin of ``fingerprint`` (kept beside it so they can't drift;
# plans modules import this instead of each other — avoids an import
# cycle between plans.pipeline and plans.datapipe).
FINGERPRINT_SQL = r"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"


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


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash document fingerprinting)
# ---------------------------------------------------------------------------

# Polynomial hash parameters (Rabin-Karp family): base 257, Mersenne
# modulus 2^31-1. Horner-with-mod keeps every intermediate < 2^39, far
# from long overflow even under ANSI mode.
_POLY_BASE = 257
_POLY_MOD = (1 << 31) - 1


def _poly_hash(s: Column, start: Column, k: int) -> Column:
    """Polynomial hash of the k chars of ``s`` starting at 1-based
    ``start`` — the same value a Rabin-Karp rolling window produces."""
    acc = F.lit(0).cast("long")
    for j in range(k):
        c = F.ascii(s.substr(start + j, F.lit(1)))
        acc = (acc * _POLY_BASE + c) % _POLY_MOD
    return acc


def _gram_hashes(norm: Column, k: int) -> Column:
    """Array of polynomial k-gram hashes over an (already materialised)
    normalized column."""
    gram_count = F.length(norm) - (k - 1)
    positions = F.when(
        gram_count > 0, F.sequence(F.lit(1), gram_count)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(positions, lambda i: _poly_hash(norm, i, k))


def _window_mins(hashes: Column, w: int) -> Column:
    """Distinct minima of every w-window over an (already materialised)
    hash-array column, with the <w fallback of the global min."""
    win_count = F.size(hashes) - (w - 1)
    win_pos = F.when(
        win_count > 0, F.sequence(F.lit(1), win_count)
    ).otherwise(F.array().cast("array<int>"))
    mins = F.transform(win_pos, lambda p: F.array_min(F.slice(hashes, p, w)))
    fallback = F.when(
        (F.size(hashes) > 0) & (win_count <= 0),
        F.array(F.array_min(hashes)),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(F.concat(mins, fallback))


def winnowing_fingerprints(text: Column, k: int = 9, w: int = 8) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03)
    as a single Column expression — FOR SHORT STRINGS / TESTS ONLY.

    Catalyst has no let-binding: the window-min lambda re-evaluates its
    ``hashes`` subtree per element, making this O(n²·k) per document.
    For corpora use ``winnowing_fingerprints_df``, which stages the
    normalize → hash → min pipeline through materialised columns.
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return _window_mins(_gram_hashes(norm, k), w)


def winnowing_fingerprints_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    w: int = 8,
) -> DataFrame:
    """Winnowing over a corpus: returns (id_col, fp: array<bigint>).

    Each stage's result is materialised behind a repartition barrier so
    lambdas reference cheap column reads instead of re-evaluating the
    previous stage per element — O(n·k) per document total (the Column
    form degrades to O(n²·k); see winnowing_fingerprints).  The
    repartitions also spread a single-file corpus across cores.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    staged = df.select(F.col(id_col), norm.alias("_norm")).repartition(par)
    hashed = staged.select(
        F.col(id_col), _gram_hashes(F.col("_norm"), k).alias("_h")
    ).repartition(par)
    return hashed.select(
        F.col(id_col), _window_mins(F.col("_h"), w).alias("fp")
    )
