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


def py_winnow(text: str, k: int = 9, w: int = 8) -> set[int]:
    """Independent pure-Python winnowing (Rabin-Karp + min windows)."""
    import re as _re

    norm = _re.sub(r"\s+", " ", text.lower()).strip()
    if len(norm) < k:
        return set()
    hs = []
    for i in range(len(norm) - k + 1):
        acc = 0
        for ch in norm[i : i + k]:
            acc = (acc * 257 + ord(ch)) % ((1 << 31) - 1)
        hs.append(acc)
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[p : p + w]) for p in range(len(hs) - w + 1)}


def test_winnowing_matches_python_oracle(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "short",
        "",
        "  Spaced    out   WORDS  here  ",
        "aaaaaaaaaaaaaaaaaaaaaaa",
        "punctuation, numbers 123 and symbols!!!",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text", ta.winnowing_fingerprints(F.col("text")).alias("fp")
    ).collect()
    for r in rows:
        assert set(r.fp) == py_winnow(r.text), repr(r.text)


def test_winnowing_detects_shared_substrings(spark):
    """Docs sharing a ≥ k+w−1 char substring must share a fingerprint."""
    shared = "this exact phrase is long enough to guarantee a match"
    df = spark.createDataFrame(
        [
            (1, f"prefix junk {shared} suffix junk"),
            (2, f"totally different framing. {shared}. and more"),
            (3, "no overlap with the others at all, none whatsoever"),
        ],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", ta.winnowing_fingerprints(F.col("text")).alias("fp")
    ).collect()
    fps = {r.doc_id: set(r.fp) for r in rows}
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3] and fps[2] & fps[3])


def test_winnowing_df_path_matches_column_path(spark):
    """The staged corpus path must produce identical fingerprint sets
    to the single-Column path (and hence the Python oracle)."""
    texts = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "short"),
        (3, ""),
        (4, "a much longer document " * 10),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    col_rows = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", ta.winnowing_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    df_rows = {
        r.doc_id: set(r.fp)
        for r in ta.winnowing_fingerprints_df(df).collect()
    }
    assert df_rows == col_rows
    for doc_id, text in texts:
        assert df_rows[doc_id] == py_winnow(text)


def test_bm25_matches_pure_python_reimplementation(spark, sf_dir):
    """Engine-independent oracle: recompute BM25 for the registered
    query's fixed term set from the raw parquet text in plain Python
    (collections.Counter + floats) and require the same top-10 docs
    with the same rounded scores.  This is a THIRD implementation —
    independent of both Spark and the DuckDB differential."""
    import collections
    import decimal

    import pandas as pd

    from another_map_reduce_spark.plans.pipeline import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        bm25_retrieval,
    )

    got = [(r.doc, r.bm25) for r in bm25_retrieval(spark, sf_dir).collect()]

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    toks = {
        int(r.doc_id): [t for t in r.text.lower().split() if t]
        for r in docs.itertuples()
    }
    dls = {d: len(ts) for d, ts in toks.items() if ts}
    n_docs = len(dls)
    avgdl = float(sum(dls.values())) / n_docs
    tf = {
        d: collections.Counter(t for t in ts if t in _BM25_TERMS)
        for d, ts in toks.items()
    }
    df = collections.Counter(t for c in tf.values() for t in c)
    scores = {}
    for d, c in tf.items():
        if not c:
            continue
        total = decimal.Decimal(0)
        for t, f in c.items():
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            num = f * (_BM25_K1 + 1.0)
            den = f + _BM25_K1 * (
                (1.0 - _BM25_B) + (_BM25_B * dls[d]) / avgdl
            )
            # mirror the engines' DECIMAL(38,12) per-term rounding
            total += decimal.Decimal((idf * num) / den).quantize(
                decimal.Decimal("1e-12"), rounding=decimal.ROUND_HALF_UP
            )
        scores[d] = round(float(total), 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_unicode_tokens_vs_whitespace(spark):
    """The \\p{L}\\p{N} face recovers stopwords glued to punctuation
    and CJK with ideographic punctuation; diacritics stay inside
    tokens; digits survive."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.text_analysis import (
        detect_language,
        unicode_alpha_char_count,
        unicode_punct_char_count,
        unicode_tokens,
    )

    rows = [
        (1, "«Le» café… est-il fermé? Je— oui; et… la— nuit tombe déjà."),
        (2, "我、不。在!这里:他;是。人?这、有。12个"),
        (3, "the naïve résumé was coöperative"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.uni, r.ws, r.toks, r.alpha, r.punct)
        for r in df.select(
            "doc_id",
            detect_language(F.col("text"), unicode_mode=True).alias("uni"),
            detect_language(F.col("text")).alias("ws"),
            unicode_tokens(F.col("text")).alias("toks"),
            unicode_alpha_char_count(F.col("text")).alias("alpha"),
            unicode_punct_char_count(F.col("text")).alias("punct"),
        ).collect()
    }
    # the ASCII face reads 'und' on both degraded docs; unicode recovers
    assert got[1][0] == "fr" and got[1][1] == "und"
    assert got[2][0] == "zh" and got[2][1] == "und"
    assert "naïve" in got[3][2] and "résumé" in got[3][2]
    assert got[3][3] == len("thenaïverésuméwascoöperative")
    assert got[3][4] == 0  # no punctuation in doc 3
    assert got[2][3] == 11  # 11 CJK letters (digits excluded)


def test_quality_score_unicode_repairs_diacritic_penalty(spark):
    """A French sentence full of diacritics scores HIGHER under the
    unicode gate than the ASCII gate (which counts é as punctuation),
    while pure-ASCII text scores identically under both."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.text_analysis import (
        quality_score,
        quality_score_unicode,
    )

    rows = [
        (1, "le café était déjà fermé hélas où est la nuit étoilée"),
        (2, "the plain ascii sentence with no accents at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.q_ascii, r.q_uni)
        for r in df.select(
            "doc_id",
            quality_score(F.col("text")).alias("q_ascii"),
            quality_score_unicode(F.col("text")).alias("q_uni"),
        ).collect()
    }
    assert got[1][1] > got[1][0]  # diacritic text repaired
    assert abs(got[2][1] - got[2][0]) < 1e-12  # ASCII unchanged


def test_split_cjk_char_voting_on_unsegmented_chinese(spark):
    """Unsegmented Chinese (no whitespace, no punctuation) is one
    token under every other tokenizer — only split_cjk char-level
    voting identifies it; non-Han text is unaffected by the flag."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.text_analysis import (
        detect_language,
        unicode_tokens,
    )

    rows = [
        (1, "我不在这里他是人这有这是我的中文句子"),
        (2, "the plain english sentence is unaffected"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.split, r.nosplit, r.n_toks)
        for r in df.select(
            "doc_id",
            detect_language(
                F.col("text"), unicode_mode=True, split_cjk=True
            ).alias("split"),
            detect_language(F.col("text"), unicode_mode=True).alias(
                "nosplit"
            ),
            F.size(unicode_tokens(F.col("text"), split_cjk=True)).alias(
                "n_toks"
            ),
        ).collect()
    }
    assert got[1] == ("zh", "und", 18)  # 18 Han chars, char-per-token
    assert got[2][0] == got[2][1] == "en"


def test_collocation_pmi_lift_is_internally_consistent(spark, sf_dir):
    from another_map_reduce_spark.plans.pipeline import (
        _PMI_MIN_C12,
        collocation_pmi,
    )

    rows = collocation_pmi(spark, sf_dir).collect()
    assert rows, "no collocations at smoke SF"
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert all(r.c12 >= _PMI_MIN_C12 for r in rows)
    assert all(r.c12 <= r.c1 and r.c12 <= r.c2 for r in rows)
    # lift * c1 * c2 / c12 reconstructs the SAME grand total N from
    # every row (up to the 6-dp rounding of lift)
    ns = [r.lift * r.c1 * r.c2 / r.c12 for r in rows]
    assert max(ns) / min(ns) < 1.001


def test_kn_bigram_probabilities_are_valid_and_consistent(spark, sf_dir):
    from another_map_reduce_spark.plans.pipeline import _KN_D, kn_bigram_lm

    rows = kn_bigram_lm(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0
        assert 1 <= r.n1p_fwd <= r.c1 and r.c12 <= r.c1
    # every row reconstructs the SAME bigram-type total N from
    # p_kn = (c12-D)/c1 + (D*fwd/c1)*(bwd/N)
    ns = [
        (_KN_D * r.n1p_fwd / r.c1) * r.n1p_bwd
        / (r.p_kn - (r.c12 - _KN_D) / r.c1)
        for r in rows
    ]
    assert max(ns) / min(ns) < 1.01


def test_vocab_growth_curve_totals_and_monotonicity(spark, sf_dir):
    from another_map_reduce_spark.operators.text_analysis import _ws_tokens
    from another_map_reduce_spark.plans.pipeline import vocab_growth_curve

    rows = vocab_growth_curve(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # cumulative columns really are prefix sums
    ct = cv = 0
    for r in rows:
        ct += r.n_tokens
        cv += r.new_types
        assert r.cum_tokens == ct and r.cum_vocab == cv
    # final cumulative = global corpus totals
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(
        __import__("pyspark.sql.functions", fromlist=["explode"]).explode(
            _ws_tokens(docs.text)
        ).alias("w")
    )
    assert rows[-1].cum_tokens == tok.count()
    assert rows[-1].cum_vocab == tok.distinct().count()
