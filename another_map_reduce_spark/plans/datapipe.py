"""Training-data pipeline query suite — [extension] (SURVEY.md §2b
north star).  Registers the operators/datapipe.py ops as driver-checked
queries; every oracle is GENERATED from the same constants/rule tables
as the Spark code (the ``*_sql`` twins), so Spark and DuckDB can't
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from another_map_reduce_spark.operators.datapipe import (
    chunk_documents,
    chunk_documents_sql,
    normalize_text,
    normalize_text_sql,
    redact_pii,
    redact_pii_sql,
    split_assign,
    split_assign_sql,
)
from another_map_reduce_spark.queries import register
from another_map_reduce_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


@register(
    "split_train_val_test",
    oracle=f"""
SELECT {split_assign_sql('doc_id')} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY split
ORDER BY split
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable md5-keyed corpus split: per-split doc count + volume.

    The assignment is a pure projection (no shuffle beyond the final
    3-group aggregate); at 100 TB the split column is computed inline
    during the write and costs one md5 per row.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_assign(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Synthetic contact blurbs built from customer columns — the synthetic
# corpus contains no real PII, so the query *constructs* emails /
# phones / SSNs deterministically, then redacts them; the oracle
# replays both steps.  (In production the construction step is the raw
# corpus and only redact_pii runs.)
_CONTACT_SPARK = None  # built inline below
_CONTACT_SQL = (
    "'reach ' || lower(replace(c_name, '#', '.')) || '@example.com'"
    " || ' or 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0')"
    " || CASE WHEN c_custkey % 3 = 0"
    " THEN ' ssn ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0')"
    " || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
    " ELSE '' END"
)


@register(
    "pii_redaction",
    oracle=f"""
SELECT c_custkey, {redact_pii_sql(_CONTACT_SQL)} AS redacted
FROM customer
""",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII masking over a synthesized contact string.

    Exercises all three rule classes (email, SSN-before-phone
    ordering, phone) on every engine-relevant shape; the redaction
    chain is three vectorised regexp_replace passes — scan speed,
    no shuffle at all (the driver compares the full 1500-row output).
    """
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    contact = F.concat(
        F.lit("reach "),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com"),
        F.lit(" or 555-"),
        F.lpad((key % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((key * 7) % 10000).cast("string"), 4, "0"),
        F.when(
            key % 3 == 0,
            F.concat(
                F.lit(" ssn "),
                F.lpad((key % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((key % 100).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad((key % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
    )
    return cust.select("c_custkey", redact_pii(contact).alias("redacted"))


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_OVERLAP = 16


@register(
    "doc_chunks",
    oracle=chunk_documents_sql(
        chunk_size=_CHUNK_SIZE, overlap=_CHUNK_OVERLAP
    ),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token windows (64 tokens, 16 overlap) over the
    corpus — the full chunk table, hash-compared row-for-row."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_size=_CHUNK_SIZE, overlap=_CHUNK_OVERLAP
    )


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------


@register(
    "text_normalize_stats",
    oracle=f"""
SELECT doc_id,
       length({normalize_text_sql('text')}) AS norm_len,
       md5({normalize_text_sql('text')}) AS norm_fp
FROM documents
""",
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalised text length + fingerprint per document — the
    normalize → fingerprint front half of every dedup pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_fp"),
    )


# ---------------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------------


@register(
    "stratified_sample",
    oracle="""
WITH sampled AS (
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5('amrs-sample-v1' || CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '80' ELSE '1a' END
)
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM sampled
GROUP BY lang
ORDER BY lang
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic corpus sampling: downsample dominant
    languages harder (en ≈ 50%, everything else ≈ 10%) — the standard
    rebalancing step before training-data mixing.

    The keep/drop decision is a per-row md5-prefix threshold
    (operators.datapipe.hash_sample) with the rate driven by the lang
    column — no rand() (rerun/retry-stable), no shuffle (pure
    projection pushed to the scan), rates adjustable per stratum
    without re-hashing.  id_checksum pins the EXACT sampled row set,
    not just its size.
    """
    from another_map_reduce_spark.operators.datapipe import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", "80").otherwise("1a")
    return (
        docs.where(hash_sample(F.col("doc_id"), rate))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Repetition signals + decontamination
# ---------------------------------------------------------------------------

_TOKS_SQL = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


@register(
    "doc_repetition_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS w FROM documents
),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2)
SELECT doc_id AS doc,
       CAST(SUM(c) AS BIGINT) AS total_grams,
       COUNT(*) AS distinct_grams,
       ROUND(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_gram_frac,
       ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_gram_frac
FROM cnt GROUP BY doc_id ORDER BY doc
""",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition quality signals: duplicate
    bigram fraction and most-frequent-bigram mass (Rae et al. 2021
    repetition filters).  Gram multiset explode → (doc, gram) partial-
    aggregated counts → per-doc rollup; both shuffle keys bounded by
    document length, so the op is linear in corpus size."""
    from another_map_reduce_spark.operators.datapipe import repetition_stats

    return repetition_stats(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", n=2
    )


@register(
    "decontam_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
  FROM toks, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
),
h AS (SELECT doc_id AS hdoc, gram FROM grams WHERE doc_id % 97 = 0),
c AS (SELECT doc_id, gram FROM grams WHERE doc_id % 97 <> 0)
SELECT c.doc_id AS doc,
       COUNT(DISTINCT gram) AS n_shared_grams,
       COUNT(DISTINCT hdoc) AS n_holdout_docs
FROM c JOIN h USING (gram)
GROUP BY doc
ORDER BY doc
""",
)
def decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination by token 4-gram overlap (the GPT-3
    appendix-C construction; docs with doc_id % 97 = 0 stand in for
    the held-out eval set).  Both sides shingle to distinct grams; the
    small holdout side broadcasts, so the corpus never shuffles before
    the per-doc aggregate."""
    from another_map_reduce_spark.operators.datapipe import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        "text",
        "doc_id",
        n=4,
    )
