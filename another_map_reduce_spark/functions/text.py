"""Tokenization expressions with exact reference parity.

The reference's tokenizer (`/root/reference/src/worker.rs:26-30`,
oracle `verify.py:12-13`):

* every byte not in ``[A-Za-z]`` becomes a separator
  (``Regex::new(r"[^A-Za-z]").replace_all(.., " ")``),
* tokens are the whitespace-split remainder (``split_whitespace`` —
  drops empty tokens),
* **case-sensitive** — no lowercasing anywhere.

These are pure Column expressions (JVM-side, whole-stage-codegen
friendly): no Python UDF in the hot path, so the tokenize → explode →
count pipeline stays vectorized at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's separator class, verbatim (src/worker.rs:26).
TOKEN_SEPARATOR_PATTERN = "[^A-Za-z]"


def tokens_column(text: Column | str, lowercase: bool = False) -> Column:
    """``array<string>`` of tokens under reference semantics.

    ``split`` on ``\\s+`` can emit a leading empty string when the text
    begins with a separator; ``array_remove`` drops it — this mirrors
    Rust ``split_whitespace``'s empty-token elision (src/worker.rs:29).
    """
    col = F.col(text) if isinstance(text, str) else text
    if lowercase:
        col = F.lower(col)
    cleaned = F.regexp_replace(col, TOKEN_SEPARATOR_PATTERN, " ")
    return F.array_remove(F.split(cleaned, r"\s+"), "")


def tokenize(text: Column | str, lowercase: bool = False) -> Column:
    """One token per row: ``explode(tokens_column(text))``.

    The Spark expression of the reference map function's emit loop
    (src/worker.rs:30-33), minus the constant "1" (supplied by the
    aggregation instead).
    """
    return F.explode(tokens_column(text, lowercase=lowercase))
