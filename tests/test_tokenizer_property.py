"""Property-based tokenizer parity: random strings vs the pure-Python
replica of the reference oracle (verify.py:12-15 semantics)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters=["\x00"]
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


def py_oracle(texts: list[str]) -> dict[str, int]:
    from collections import defaultdict

    counts: defaultdict[str, int] = defaultdict(int)
    for t in texts:
        for w in re.sub(r"[^A-Za-z]", " ", t).split():
            counts[w] += 1
    return dict(counts)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_wordcount_matches_python_oracle(spark, texts):
    from another_map_reduce_spark.operators.wordcount import word_count

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r.word: r.cnt for r in word_count(df).collect()}
    assert got == py_oracle(texts)
