"""Training-data pipeline operators — [extension] (driver north star).

The ops a 100 TB LLM-corpus build needs between "raw documents" and
"training shards", beyond dedup/similarity (operators/dedup.py,
similarity.py) and scoring (text_analysis.py):

* deterministic split  — stable train/val/test assignment from a key
* PII redaction        — regex masking of emails / phone numbers
* document chunking    — fixed-size token windows with overlap
* text normalization   — case/punctuation/whitespace canonicalisation

Everything is pure Column expressions (JVM-side, whole-stage codegen,
no UDFs): each op runs at scan speed and is embarrassingly parallel —
zero shuffles introduced by any op in this module.  All four are
cross-engine deterministic, so the DuckDB oracle hash-checks them.

The reference has no counterpart for any of these
(`/root/reference/src/worker.rs:23-38` is count-by-key only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

# Split boundaries as md5-hex prefixes: the first byte of the digest is
# uniform over 0..255, and *lexicographic* comparison of the two-char
# hex prefix is identical in every engine (no integer parsing needed).
# 0x00–0xcb → train (204/256 ≈ 79.7%), 0xcc–0xe5 → val (26/256 ≈
# 10.2%), 0xe6–0xff → test (26/256 ≈ 10.2%).
TRAIN_HI = "cc"
VAL_HI = "e6"


def split_assign(key: Column, salt: str = "amrs-split-v1") -> Column:
    """Stable 'train'/'val'/'test' label from an arbitrary key column.

    md5(salt || key) — NOT a random() draw: assignment survives
    reruns, repartitioning, and incremental appends (a re-ingested
    document lands in the same split forever, which is what keeps
    eval sets uncontaminated as the corpus grows).  The salt gives
    independent re-draws when a new split layout is needed.
    """
    prefix = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 2)
    return (
        F.when(prefix < TRAIN_HI, "train")
        .when(prefix < VAL_HI, "val")
        .otherwise("test")
    )


def split_assign_sql(key_sql: str, salt: str = "amrs-split-v1") -> str:
    """DuckDB twin of ``split_assign`` — generated from the same
    constants so the two can't drift."""
    prefix = f"substring(md5('{salt}' || CAST({key_sql} AS VARCHAR)), 1, 2)"
    return (
        f"CASE WHEN {prefix} < '{TRAIN_HI}' THEN 'train' "
        f"WHEN {prefix} < '{VAL_HI}' THEN 'val' ELSE 'test' END"
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b word boundaries —
# no lookarounds, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),  # before PHONE: 3-2-4 must not half-match 3-3-4
    (PHONE_RE, "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Mask emails, SSNs, and phone numbers with typed placeholders.

    Order matters (SSN before phone — overlapping digit shapes); each
    rule is a single vectorised regexp_replace, so the whole chain is
    one projection over the corpus.
    """
    out = text
    for pat, repl in _RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(text_sql: str) -> str:
    """DuckDB twin of ``redact_pii`` — same rule table, same order."""
    out = text_sql
    for pat, repl in _RULES:
        # DuckDB string literals are escape-free: '\b' IS backslash-b,
        # so the pattern goes in verbatim (only quotes need doubling)
        out = f"regexp_replace({out}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    return out


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap.

    Output: (doc, chunk_idx, n_tokens, chunk_text) — one row per
    window, stride = chunk_size - overlap, trailing partial window
    kept (standard LLM-pretraining chunking).  Tokenisation is
    whitespace (the BPE-ish path lives in text_analysis.py).

    Pure explode of per-row slices: no shuffle, and output rows are
    ~(1 + overlap/chunk_size)× the input tokens — the replication
    factor a 100 TB corpus actually pays is the overlap ratio, which
    is why overlap is a parameter and not a constant.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    # stage the token array so the per-chunk slices below read a
    # materialised column instead of re-splitting text per chunk
    # (Catalyst has no let-binding; same pattern as dedup.shingle_docs)
    par = df.sparkSession.sparkContext.defaultParallelism
    staged = df.select(
        F.col(id_col).alias("doc"), toks.alias("_toks")
    ).repartition(par)
    n = F.size("_toks")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.slice(F.col("_toks"), s + 1, chunk_size).alias("_ctoks"),
        ),
    )
    return (
        staged.select("doc", F.explode(chunks).alias("c"))
        .select(
            "doc",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c._ctoks").alias("n_tokens"),
            F.concat_ws(" ", "c._ctoks").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str = "documents",
    text_sql: str = "text",
    id_sql: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB twin of ``chunk_documents`` (same constants, same
    trailing-window semantics; DuckDB lists are 1-based)."""
    step = chunk_size - overlap
    toks = f"list_filter(string_split_regex({text_sql}, '\\s+'), t -> t <> '')"
    return f"""
WITH t AS (
  SELECT {id_sql} AS doc, {toks} AS toks FROM {table}
),
s AS (
  SELECT doc, toks, unnest(range(1, greatest(len(toks), 0) + 1, {step})) AS start
  FROM t WHERE len(toks) > 0
)
SELECT doc,
       CAST((start - 1) / {step} AS INT) AS chunk_idx,
       len(list_slice(toks, start, least(start + {chunk_size} - 1, len(toks)))) AS n_tokens,
       array_to_string(list_slice(toks, start, least(start + {chunk_size} - 1, len(toks))), ' ') AS chunk_text
FROM s
"""


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting/equality: lowercase, strip
    non-alphanumerics to spaces, collapse runs of whitespace, trim.

    Three vectorised regexp passes — one projection, scan speed.
    ASCII-class based ([^a-z0-9\\s]) so Java and RE2 agree exactly;
    Unicode-aware folding would need ICU on both sides.
    """
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", " ")
    collapsed = F.regexp_replace(stripped, r"\s+", " ")
    return F.trim(collapsed)


def normalize_text_sql(text_sql: str) -> str:
    """DuckDB twin of ``normalize_text``."""
    return (
        "trim(regexp_replace(regexp_replace(lower("
        + text_sql
        + r"), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"
    )


def hash_sample(key: Column, rate_hex2: Column | str) -> Column:
    """Deterministic Bernoulli sample predicate: keep rows whose
    md5('amrs-sample-v1' || key) two-char hex prefix sorts below
    ``rate_hex2`` (e.g. '80' ≈ 50%, '1a' ≈ 10.2%).

    Same engine-portable construction as ``split_assign`` — the sample
    is a pure projection (no shuffle, no rand()), stable under reruns,
    repartitioning, and appends, and the threshold can vary per row
    (stratified rates from a dimension column).
    """
    rate = F.lit(rate_hex2) if isinstance(rate_hex2, str) else rate_hex2
    prefix = F.substring(
        F.md5(F.concat(F.lit("amrs-sample-v1"), key.cast("string"))), 1, 2
    )
    return prefix < rate


def class_balanced_sample(
    df: DataFrame,
    class_col: str,
    key: Column,
    salt: str = "amrs-balance-v1",
) -> DataFrame:
    """Exact class-balanced downsampling: every class keeps the SAME
    number of rows — the size of the smallest class — chosen by
    deterministic md5 rank, so the subset is stable under reruns and
    repartitioning (the class-imbalance remedy applied before training
    on skewed label/source distributions).

    Plan shape: one class-keyed exchange for the rank window plus a
    |classes|-row broadcast of the min class size; at 100 TB both the
    window and the filter are per-class local work.  Hash-rank (not
    rand()) makes the kept set engine-portable: the oracle replays it
    row-for-row.
    """
    r = F.md5(F.concat(F.lit(salt), key.cast("string")))
    w = Window.partitionBy(class_col).orderBy(r.asc(), key.asc())
    ranked = df.withColumn("_rk", F.row_number().over(w))
    n_min = (
        df.groupBy(class_col)
        .count()
        .agg(F.min("count").alias("_nmin"))
    )
    return (
        ranked.crossJoin(F.broadcast(n_min))
        .where(F.col("_rk") <= F.col("_nmin"))
        .drop("_rk", "_nmin")
    )


_PRIORITY_SALT = "amrs-priority-v1"
_PRIORITY_SPACE = float(1 << 52)  # 2^52, exact in double


def priority_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    k: int,
    salt: str = _PRIORITY_SALT,
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): a
    weight-aware sample of exactly ``k`` rows that supports UNBIASED
    subset-sum estimation — the sampling scheme for "estimate any
    future SUM over this 100 TB table from k rows" workloads, strictly
    better than Bernoulli-per-row for heavy-tailed weights (a huge row
    is kept with probability → 1 instead of contributing variance).

    Each row draws priority q = w / u with u uniform on (0,1]; the k
    largest-priority rows are kept, and τ = the (k+1)-th priority is
    the Horvitz–Thompson threshold: Σ max(w_i, τ) over the sample is
    an unbiased estimator of ANY subset's true weight sum.

    Determinism (the suite's no-rand() rule): u = (h+1)/2^52 with h
    the kmv-style 52-bit md5 hash of (salt || key) — h+1 ≤ 2^52 is
    exact in a double and the two divisions (u, then w/u) are
    correctly-rounded IEEE ops, so both engines draw bit-identical
    priorities and the kept set is engine-exact, rerun-stable, and
    append-stable (old rows keep their priorities; an append only
    competes at the τ boundary).

    Plan shape: the priority is a pure projection (no shuffle);
    selecting the top k+1 is Spark's distributed TakeOrdered (per-
    partition top-(k+1), then a (k+1)·P-row merge) — never a global
    sort — and the window that ranks / extracts τ runs on the (k+1)-row
    result.  Output: the k kept rows as (key, weight, priority, τ,
    ht_weight = max(w, τ)) with priorities rounded for display only
    AFTER selection.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_PRIORITY_SPACE)
    q = weight.cast("double") / u
    cand = (
        df.select(
            key.alias("_key"),
            weight.cast("double").alias("_w"),
            q.alias("_q"),
        )
        .orderBy(F.desc("_q"), F.asc("_key"))
        .limit(k + 1)
    )
    w_all = Window.orderBy(F.desc("_q"), F.asc("_key")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rank = Window.orderBy(F.desc("_q"), F.asc("_key"))
    tau = F.max(F.when(F.row_number().over(w_rank) == k + 1, F.col("_q"))).over(
        w_all
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w_rank))
        # A corpus with ≤ k rows has no (k+1)-th priority: τ = 0 keeps
        # ht_weight = w exactly (the sample is then a census).
        .withColumn("_tau", F.coalesce(tau, F.lit(0.0)))
        .where(F.col("_rn") <= k)
        .select(
            F.col("_key"),
            F.col("_w"),
            F.col("_q"),
            F.col("_tau"),
            F.greatest(F.col("_w"), F.col("_tau")).alias("_ht"),
        )
    )


# ---------------------------------------------------------------------------
# Intra-document repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document n-gram repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters — public):
    boilerplate and generated spam repeat themselves, so the fraction
    of duplicated n-grams and the mass of the single most frequent
    n-gram are strong document-quality features.

    Output: (doc, total_grams, distinct_grams, dup_gram_frac,
    top_gram_frac), one row per document with ≥ n tokens.

    Shape: tokenize once behind a repartition barrier (same staging
    rule as dedup.shingle_docs — Catalyst has no let-binding, and the
    gram fold reads the token array n× per element), explode the gram
    MULTISET, then two partial-aggregated shuffles: (doc, gram) counts,
    then per-doc rollup.  Both keys are bounded by document length —
    no corpus-wide hot key, so the op scales linearly with corpus
    size.  The reference has no per-document analysis at all
    (/root/reference/src/worker.rs:23-38 is global count-by-key).
    """
    from another_map_reduce_spark.operators.dedup import ngram_list

    par = df.sparkSession.sparkContext.defaultParallelism
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    staged = (
        df.select(F.col(id_col).alias("doc"), toks.alias("_w"))
        .where(F.size("_w") >= n)
        .repartition(par)
    )
    grams = staged.select(
        "doc", F.explode(ngram_list(F.col("_w"), n)).alias("gram")
    )
    per_gram = grams.groupBy("doc", "gram").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy("doc")
        .agg(
            F.sum("c").alias("total_grams"),
            F.count("*").alias("distinct_grams"),
            F.round(
                1.0 - F.count("*") / F.sum("c").cast("double"), 6
            ).alias("dup_gram_frac"),
            F.round(F.max("c") / F.sum("c").cast("double"), 6).alias(
                "top_gram_frac"
            ),
        )
        .orderBy("doc")
    )


# ---------------------------------------------------------------------------
# Train/test decontamination (n-gram overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-document overlap with a held-out evaluation set by
    distinct token n-grams (the GPT-3 appendix-C decontamination
    construction, Brown et al. 2020 — public; they used 13-grams, the
    n here is a parameter).

    Output: (doc, n_shared_grams, n_holdout_docs) for every corpus
    document sharing ≥ 1 n-gram with any holdout document — the rows a
    pipeline would drop (or flag) before training.

    Shape: both sides shingle to DISTINCT grams (dedup.shingle_docs —
    tokenization staged behind a barrier), explode, and equi-join on
    the gram string.  Holdout/eval sets are small by nature, so the
    gram join broadcasts the holdout side and the corpus side streams
    map-side — zero corpus shuffle before the final per-doc aggregate.
    At 100 TB the join key would be xxhash64(gram) (8 bytes vs the
    gram string; collisions only ever ADD a flagged doc) — the string
    key is kept here for bit-exact cross-engine oracle parity.
    """
    from another_map_reduce_spark.operators.dedup import shingle_docs

    c = (
        shingle_docs(corpus, text_col, id_col, n)
        .select("doc", F.explode("shingles").alias("gram"))
    )
    h = (
        shingle_docs(holdout, text_col, id_col, n)
        .select(
            F.col("doc").alias("hdoc"), F.explode("shingles").alias("gram")
        )
    )
    return (
        c.join(F.broadcast(h), "gram")
        .groupBy("doc")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("hdoc").alias("n_holdout_docs"),
        )
        .orderBy("doc")
    )
