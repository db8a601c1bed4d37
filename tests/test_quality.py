"""Corpus-quality gates + mixing (operators/quality.py) and the
duplicate-substring span query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.operators.quality import (
    GOPHER_STOPWORDS,
    MIN_WORDS,
    domain_mix_report,
    gopher_quality_flags,
)


def _doc(text, lang="en", source="s0", doc_id=1):
    return (doc_id, text, lang, source, len(text))

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_gopher_flags_rules(spark):
    good = " ".join(
        ["the", "cat", "sat", "with", "the", "dog", "and", "that", "was"]
        + ["fine"] * (MIN_WORDS - 9)
    )
    short = "too short"
    braces = good + " {code}"
    no_stop = " ".join(["xyz"] * MIN_WORDS)
    df = spark.createDataFrame(
        [
            _doc(good, doc_id=1),
            _doc(short, doc_id=2),
            _doc(braces, doc_id=3),
            _doc(no_stop, doc_id=4),
        ],
        SCHEMA,
    )
    rows = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert rows[1].pass_all
    assert not rows[2].ok_word_count and not rows[2].pass_all
    assert not rows[3].ok_no_braces and not rows[3].pass_all
    assert not rows[4].ok_stopwords and not rows[4].pass_all
    # metric sanity: word_chars is the exact sum of token lengths
    assert rows[2].n_words == 2 and rows[2].word_chars == len("tooshort")


def test_gopher_flags_empty_doc(spark):
    df = spark.createDataFrame([_doc(""), _doc("   ", doc_id=2)], SCHEMA)
    rows = gopher_quality_flags(df).collect()
    for r in rows:
        assert r.n_words == 0 and r.word_chars == 0
        assert r.mean_word_len == 0.0 and not r.pass_all


def test_stopword_list_is_gopher():
    assert GOPHER_STOPWORDS == (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )


def test_domain_mix_weights_sum_to_one(spark):
    df = spark.createDataFrame(
        [
            _doc("a b c", source="big", doc_id=i) for i in range(8)
        ]
        + [_doc("a b c d e f", source="small", doc_id=100)],
        SCHEMA,
    )
    rows = {r.source: r for r in domain_mix_report(df).collect()}
    assert rows["big"].n_tokens == 24 and rows["small"].n_tokens == 6
    assert abs(sum(r.mix_weight for r in rows.values()) - 1.0) < 1e-5
    assert abs(sum(r.token_share for r in rows.values()) - 1.0) < 1e-5
    # temperature 0.5 upsamples the small domain above its raw share
    assert rows["small"].mix_weight > rows["small"].token_share


def test_dup_substring_stats_planted(spark):
    """Two docs sharing an exact 12-token span are both flagged; a
    unique doc is not."""
    from another_map_reduce_spark.plans.datapipe import dup_substring_stats

    span = " ".join(f"tok{i}" for i in range(12))
    uniq1 = " ".join(f"one{i}" for i in range(12))
    uniq2 = " ".join(f"two{i}" for i in range(12))
    uniq3 = " ".join(f"three{i}" for i in range(12))
    import tempfile, os

    d = tempfile.mkdtemp()
    df = spark.createDataFrame(
        [
            _doc(uniq1 + " " + span, doc_id=1),
            _doc(span + " " + uniq2, doc_id=2),
            _doc(uniq3, doc_id=3),
        ],
        SCHEMA,
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in dup_substring_stats(spark, d).collect()}
    assert out[1].n_dup_windows >= 1 and out[2].n_dup_windows >= 1
    assert out[3].n_dup_windows == 0
    assert out[1].n_windows == 24 - 10 + 1  # 24 tokens, W=10, stride 1
    assert 0.0 < out[1].dup_frac < 1.0


def test_corpus_build_report_consistency(spark, sf_dir):
    """Survivor accounting: the report's doc total equals the number
    of distinct fingerprints among gate-passing docs."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.quality import (
        gopher_quality_flags,
    )
    from another_map_reduce_spark.operators.text_analysis import fingerprint
    from another_map_reduce_spark.plans.datapipe import corpus_build_report
    from another_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    passed = gopher_quality_flags(docs).where(F.col("pass_all"))
    expected = (
        passed.select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    report = corpus_build_report(spark, sf_dir)
    assert report.agg(F.sum("n_docs")).collect()[0][0] == expected
    splits = {r.split for r in report.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_semantic_dedup_conservation(spark, sf_dir):
    """Per-label kept + removed == total, and something is removed at
    the τ=0.4 planted-cluster threshold."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.plans.datapipe import semantic_dedup_stats
    from another_map_reduce_spark.sources.tables import load_table

    rep = semantic_dedup_stats(spark, sf_dir)
    rows = rep.collect()
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == emb_n
    assert all(r.n_kept + r.n_dup_removed == r.n_vectors for r in rows)
    assert all(r.n_kept >= 1 for r in rows)


def test_gopher_flags_property_vs_python(spark):
    """Property check: the Spark rule columns equal a direct Python
    reimplementation of the Gopher/C4 rules on adversarial docs
    (empty, whitespace-only, punctuation runs, unicode, long words)."""
    import re

    from another_map_reduce_spark.operators import quality as Q

    docs = [
        "",
        "   ",
        "\t\n  \n",
        "the the the the " * 10,
        "supercalifragilisticexpialidocious " * 30,
        "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 2,
        "... ### ... ### " * 10,
        "Ünïcödé wörds with the and of and that " * 5,
        "{json: true} the be to of and that have with " * 5,
        "word." + " word" * 40,
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)], SCHEMA
    )
    got = {r.doc_id: r for r in Q.gopher_quality_flags(df).collect()}

    for i, text in enumerate(docs):
        toks = re.split(r"\s+", text.strip()) if text.strip() else []
        n_words = len(toks)
        word_chars = sum(len(t) for t in toks)
        nw = max(n_words, 1)
        mean_wlen = round(word_chars / nw, 6)
        alpha = round(
            len([t for t in toks if re.search("[A-Za-z]", t)]) / nw, 6
        )
        symbol = round(
            len([t for t in toks if re.search(r"#|\.\.\.", t)]) / nw, 6
        )
        stop = len([t for t in toks if t.lower() in Q.GOPHER_STOPWORDS])
        r = got[i]
        assert r.n_words == n_words, (i, r.n_words, n_words)
        assert r.word_chars == word_chars
        assert r.mean_word_len == mean_wlen
        assert r.alpha_word_ratio == alpha
        assert r.symbol_word_ratio == symbol
        assert r.stopword_hits == stop
        assert r.ok_no_braces == ("{" not in text)
        expected_pass = (
            Q.MIN_WORDS <= n_words <= Q.MAX_WORDS
            and Q.MIN_MEAN_WORD_LEN <= mean_wlen <= Q.MAX_MEAN_WORD_LEN
            and alpha >= Q.MIN_ALPHA_WORD_RATIO
            and symbol <= Q.MAX_SYMBOL_RATIO
            and stop >= Q.MIN_STOPWORD_HITS
            and "{" not in text
        )
        assert r.pass_all == expected_pass, (i, text[:40])


def test_gopher_flags_custom_text_col(spark):
    """All rules (including the brace ban) must read the configured
    text column, not a hardcoded 'text'."""
    from another_map_reduce_spark.operators.quality import (
        gopher_quality_flags,
    )

    df = spark.createDataFrame(
        [(1, "the cat {brace} sat"), (2, "plain words here")],
        "doc_id long, body string",
    )
    rows = {
        r.doc_id: r
        for r in gopher_quality_flags(df, text_col="body").collect()
    }
    assert not rows[1].ok_no_braces
    assert rows[2].ok_no_braces


def test_bigram_lm_topk_planted(spark):
    """Conditional probabilities from a tiny planted corpus."""
    import os
    import tempfile

    from another_map_reduce_spark.queries import QUERIES

    bigram_lm_topk = QUERIES["bigram_lm_topk"]
    d = tempfile.mkdtemp()
    df = spark.createDataFrame(
        [
            (1, "a b a b a c", "en", "s", 11),
            (2, "a b", "en", "s", 3),
            (3, "x", "en", "s", 1),  # single token: no bigrams
        ],
        SCHEMA,
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {(r.w1, r.w2): r for r in bigram_lm_topk(spark, d).collect()}
    # corpus bigrams: doc1 -> (a,b)x2 (b,a)x2 (a,c); doc2 -> (a,b)
    assert rows[("a", "b")].c12 == 3
    assert rows[("a", "b")].c1 == 4           # a-starting bigrams: 3 + (a,c)
    assert rows[("a", "b")].p_cond == 0.75
    assert rows[("a", "c")].p_cond == 0.25
    assert rows[("b", "a")].c12 == 2 and rows[("b", "a")].p_cond == 1.0
    assert ("x", "x") not in rows


def test_cohort_retention_planted(spark):
    """Retention triangle on a hand-built event log: two cohorts, one
    retained user."""
    import os
    import tempfile
    from datetime import datetime

    from another_map_reduce_spark.queries import QUERIES

    rows = [
        # user 1: first seen week of Jan 1 (Mon), active again week+1
        (1, datetime(2024, 1, 2, 10), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 9, 10), 1, "view", 1.0, "{}"),
        # user 2: same cohort, never returns
        (3, datetime(2024, 1, 3, 10), 2, "view", 1.0, "{}"),
        # user 3: next-week cohort
        (4, datetime(2024, 1, 10, 10), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r.cohort_week.day, r.week_offset): r
        for r in QUERIES["cohort_retention"](spark, d).collect()
    }
    # cohort of Mon Jan 1: 2 users at offset 0, 1 at offset 1
    assert out[(1, 0)].n_active == 2 and out[(1, 0)].retention == 1.0
    assert out[(1, 1)].n_active == 1 and out[(1, 1)].retention == 0.5
    # cohort of Mon Jan 8: 1 user, offset 0 only
    assert out[(8, 0)].cohort_size == 1
    assert (8, 1) not in out


def test_misra_gries_capture_bound(spark):
    """Adversarial partitioning cannot hide a theta-heavy word from
    the candidate union, and the exact recount matches a plain
    groupBy."""
    from another_map_reduce_spark.operators.sketches import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )

    # 300 'hot' + a 5000-singleton tail, sprayed across partitions
    rows = [("hot",)] * 300 + [(f"tail{i}",) for i in range(5000)]
    words = spark.createDataFrame(rows, "word string").repartition(16)
    cands = {r.word for r in misra_gries_candidates(words, k=50).collect()}
    assert "hot" in cands
    hh = heavy_hitters_exact(words, theta=0.05)
    got = {(r.word, r.cnt) for r in hh.collect()}
    assert got == {("hot", 300)}  # 300/5300 ≈ 5.7% > θ; no tail word
