"""Tokenizer + word-count parity with the reference oracle.

The pure-Python oracle below replicates /root/reference/verify.py:6-15
byte-for-byte in behavior: regex [^A-Za-z] → space, whitespace split,
case-sensitive defaultdict count.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.operators.wordcount import (
    word_count,
    word_count_bucketed,
)

EDGE_TEXTS = [
    "Hello, hello WORLD!  world world",
    "don't stop-me now; 123abc456def",
    "   leading and trailing   ",
    "",
    "ALLCAPS allcaps AllCaps",
    "tabs\tand\nnewlines\r\nhere",
    "unicode café naïve 東京 emoji 🎉 ok",
    "a",
    "1234567890 !!! ???",
]


def oracle_counts(texts: list[str]) -> dict[str, int]:
    counts: defaultdict[str, int] = defaultdict(int)
    for t in texts:
        for w in re.sub(r"[^A-Za-z]", " ", t).split():
            counts[w] += 1
    return dict(counts)


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")


def test_wordcount_matches_reference_oracle(spark, edge_df):
    got = {r.word: r.cnt for r in word_count(edge_df).collect()}
    assert got == oracle_counts(EDGE_TEXTS)


def test_wordcount_case_sensitive(spark, edge_df):
    got = {r.word: r.cnt for r in word_count(edge_df).collect()}
    assert got["ALLCAPS"] == 1
    assert got["allcaps"] == 1
    assert got["AllCaps"] == 1


def test_wordcount_no_empty_tokens(spark, edge_df):
    words = [r.word for r in word_count(edge_df).collect()]
    assert "" not in words
    assert all(re.fullmatch(r"[A-Za-z]+", w) for w in words)


def test_wordcount_total_order(spark, edge_df):
    words = [r.word for r in word_count(edge_df).collect()]
    assert words == sorted(words)


def test_wordcount_on_documents(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = word_count(df, "text")
    texts = [r.text for r in df.select("text").collect()]
    got = {r.word: r.cnt for r in res.collect()}
    assert got == oracle_counts(texts)


def test_bucketed_layout(spark, edge_df):
    """R hash partitions, ascending keys within each (SURVEY §2a #5,#11)."""
    r = 3
    res = word_count_bucketed(edge_df, num_buckets=r)
    rows = res.collect()
    # bucket assignment is pmod(hash(word), R)
    for row in rows:
        assert 0 <= row.bucket < r
    # counts identical to the unbucketed path
    got = {row.word: row.cnt for row in rows}
    assert got == oracle_counts(EDGE_TEXTS)
    # within each physical partition rows are (bucket, word)-ascending,
    # so each bucket's file comes out with keys ascending — the
    # reference's reduce_result_{r} contract (src/worker.rs:118,148)
    def partition_sorted(it):
        part = [(b, w) for (w, b) in it]
        return [part == sorted(part)]

    flags = res.select("word", "bucket").rdd.mapPartitions(
        lambda it: partition_sorted(list(it))
    ).collect()
    assert all(flags)


def test_lowercase_variant(spark, edge_df):
    got = {r.word: r.cnt for r in word_count(edge_df, lowercase=True).collect()}
    assert got["allcaps"] == 3
