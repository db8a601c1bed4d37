"""Text-analysis expression tests on crafted inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.operators import text_analysis as ta


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, "The cat and the dog, of course!"),
        (2, "le chat est un animal et je le vois"),
        (3, "der Hund ist ein Tier und ich bin zu Hause"),
        (4, ""),
        (5, "12345 !!!"),
        (6, "word"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df, col_expr, doc_id):
    return (
        df.where(F.col("doc_id") == doc_id).select(col_expr.alias("v")).collect()[0].v
    )


def test_token_counts(spark, sample):
    assert _one(sample, ta.ws_token_count(F.col("text")), 1) == 7
    assert _one(sample, ta.ws_token_count(F.col("text")), 4) == 0
    # BPE-ish: alpha runs + single digits + single symbols
    assert _one(sample, ta.bpe_ish_token_count(F.col("text")), 5) == 8
    assert _one(sample, ta.bpe_ish_token_count(F.col("text")), 1) == 9


def test_char_counts(spark, sample):
    assert _one(sample, ta.alpha_char_count(F.col("text")), 5) == 0
    assert _one(sample, ta.punct_char_count(F.col("text")), 5) == 3
    assert _one(sample, ta.alpha_char_count(F.col("text")), 6) == 4


def test_language_detection(spark, sample):
    assert _one(sample, ta.detect_language(F.col("text")), 1) == "en"
    assert _one(sample, ta.detect_language(F.col("text")), 2) == "fr"
    assert _one(sample, ta.detect_language(F.col("text")), 3) == "de"
    assert _one(sample, ta.detect_language(F.col("text")), 4) == "und"
    assert _one(sample, ta.detect_language(F.col("text")), 5) == "und"


def test_quality_score_ordering(spark, sample):
    """Clean English prose outranks digits-and-punctuation noise."""
    good = _one(sample, ta.quality_score(F.col("text")), 1)
    bad = _one(sample, ta.quality_score(F.col("text")), 5)
    assert good > bad


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: r.fp
        for r in df.select("doc_id", ta.fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[2]  # case + whitespace insensitive
    assert fps[1] != fps[3]
    assert len(fps[1]) == 32  # md5 hex


def test_text_stats_frame(spark, sample):
    out = ta.text_stats(sample)
    cols = set(out.columns)
    assert {
        "n_chars_actual",
        "n_tokens_ws",
        "n_tokens_bpe",
        "n_alpha",
        "n_punct",
        "pred_lang",
        "quality",
        "fp",
    } <= cols
    assert out.count() == 6
