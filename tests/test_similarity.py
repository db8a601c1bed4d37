"""Similarity-search tests: brute-force correctness + IVF recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
)
from another_map_reduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_topk_matches_numpy_oracle(spark, emb):
    """Brute-force path vs an independent pure-Python computation."""
    rows = emb.collect()
    vecs = {r.vec_id: r.embedding for r in rows}

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return dot / (na * nb)

    qid = min(vecs)
    expected = sorted(
        ((cid, cos(vecs[qid], v)) for cid, v in vecs.items() if cid != qid),
        key=lambda t: (-t[1], t[0]),
    )[:5]

    got = (
        cosine_topk(emb, emb.where(F.col("vec_id") == qid), k=5)
        .orderBy("rank")
        .collect()
    )
    assert [(r.cid) for r in got] == [c for c, _ in expected]
    for r, (_, expected_cos) in zip(got, expected):
        assert abs(r.cos - expected_cos) < 1e-9


def test_topk_excludes_self_and_ranks(spark, emb):
    out = cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=7).collect()
    by_q = {}
    for r in out:
        assert r.qid != r.cid
        by_q.setdefault(r.qid, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, 8))
        coss = [r.cos for r in rs]
        assert coss == sorted(coss, reverse=True)


def test_cosine_pairs_symmetric_threshold(spark, emb):
    sub = emb.where(F.col("vec_id") < 40)
    out = cosine_pairs(sub, threshold=0.1).collect()
    assert all(r.v1 < r.v2 for r in out)
    assert all(r.cos >= 0.1 for r in out)


def test_ivf_recall_vs_bruteforce(spark, emb):
    """nprobe=4 of 16 cells ⇒ ≥ ~25% of the corpus is scanned per query
    on near-random vectors; top-10 recall must clear 0.3 and the ivf
    result must never contain a vector the brute-force path scores
    higher than its rank-k cutoff... i.e. ivf ⊆ scored corpus."""
    queries = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, num_cells=16, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.qid, set()).add(r.cid)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.qid, set()).add(r.cid)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.3, recalls
