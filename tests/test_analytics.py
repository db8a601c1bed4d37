"""Unit tests for the round-5 analytics suite (plans/analytics.py).

The oracle differential in test_relational.py already hash-checks
every registered query against DuckDB at sf0.001; these tests pin the
operator-level properties that a hash can't articulate — LOCF
semantics on the spine, histogram clamping, regression vs numpy,
PageRank vs a hand-computable graph.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.plans.analytics import (
    pagerank,
    pagerank_suppliers,
    regression_by_flag,
    timeseries_gapfill_locf,
)


def test_gapfill_spine_is_dense_and_locf(spark, sf_dir):
    rows = timeseries_gapfill_locf(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user, "no users in the spine"
    for user, rs in by_user.items():
        hours = [r.hour for r in rs]
        # dense: consecutive hours, no holes, no duplicates
        assert len(set(hours)) == len(hours)
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600, (user, a, b)
        # the first spine row is an observation by construction
        assert rs[0].is_gap == 0
        # LOCF: after the first observation, value_filled never nulls,
        # and gap rows repeat the previous filled value
        prev = rs[0].value_filled
        for r in rs[1:]:
            assert r.value_filled is not None
            if r.is_gap == 1:
                assert r.value_filled == prev
            prev = r.value_filled


def test_histogram_clamps_overflow_bucket(spark):
    from another_map_reduce_spark.plans.analytics import _HIST_NB, _HIST_W

    df = spark.createDataFrame(
        [(1, _HIST_W * (_HIST_NB + 5),), (2, -1.0)], "o_orderkey long, v double"
    )
    bucket = F.least(
        F.floor(F.col("v") / F.lit(_HIST_W)), F.lit(_HIST_NB - 1)
    ).cast("long")
    got = {r.o_orderkey: r.b for r in df.select("o_orderkey", bucket.alias("b")).collect()}
    assert got[1] == _HIST_NB - 1  # above range clamps to last bucket
    assert got[2] == -1  # below range surfaces as -1 (auditable, not hidden)


def test_regression_matches_numpy(spark, sf_dir):
    rows = {r.l_returnflag: r for r in regression_by_flag(spark, sf_dir).collect()}
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy()
        y = g["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        corr = np.corrcoef(x, y)[0, 1]
        r = rows[flag]
        assert r.n_rows == len(g)
        assert r.corr_qty_price == pytest.approx(corr, abs=1e-5)
        assert r.slope == pytest.approx(slope, rel=1e-5)
        assert r.intercept == pytest.approx(intercept, rel=1e-4)


def _np_pagerank(edges: list[tuple[int, int]], iters: int, damp: float):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - damp) / n)
        for s, d in edges:
            nxt[idx[d]] += damp * r[idx[s]] / out[idx[s]]
        r = nxt
    return {node: r[idx[node]] for node in nodes}


def test_pagerank_matches_numpy_on_known_graph(spark):
    # 4-node graph, symmetrized star plus a chord — hand-checkable
    base = [(1, 2), (1, 3), (1, 4), (2, 3)]
    edges = base + [(b, a) for a, b in base]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    want = _np_pagerank(edges, iters=5, damp=0.85)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    # no dangling nodes → damped update conserves total mass
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_suppliers_shape(spark, sf_dir):
    rows = pagerank_suppliers(spark, sf_dir).collect()
    assert len(rows) == 20
    ranks = [r.pagerank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.pagerank > 0 for r in rows)
    for r in rows:
        want = "customer" if r.node >= 1_000_000_000 else "supplier"
        assert r.node_type == want
