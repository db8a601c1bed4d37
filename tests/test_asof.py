"""As-of / range join tests against an independent pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from another_map_reduce_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 3, 11.0),
            ("A", 3, 12.0),  # same-time duplicate: tiebreak picks qid max
            ("A", 7, 13.0),
            ("B", 2, 20.0),
        ],
        "sym string, t long, px double",
    ).withColumn("qid", F.monotonically_increasing_id())
    trades = spark.createDataFrame(
        [("A", 0), ("A", 3), ("A", 5), ("A", 9), ("B", 1), ("B", 4), ("C", 2)],
        "sym string, t long",
    )
    return quotes, trades


def test_asof_inclusive(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_time="t",
        right_time="t",
        right_cols=["px"],
        tiebreak="qid",
    )
    got = {(r.sym, r.t): r.px_asof for r in out.collect()}
    assert got[("A", 0)] is None  # no quote yet
    assert got[("A", 3)] == 12.0  # inclusive; same-time dup → max qid wins
    assert got[("A", 5)] == 12.0
    assert got[("A", 9)] == 13.0
    assert got[("B", 1)] is None
    assert got[("B", 4)] == 20.0
    assert got[("C", 2)] is None  # key with no right rows


def test_asof_strict(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_time="t",
        right_time="t",
        right_cols=["px"],
        tiebreak="qid",
        strict=True,
    )
    got = {(r.sym, r.t): r.px_asof for r in out.collect()}
    assert got[("A", 3)] == 10.0  # strictly-before only


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized check vs pandas.merge_asof (backward, inclusive)."""
    import numpy as np

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], 200),
            "t": rng.randint(0, 1000, 200).astype("int64"),
        }
    ).sort_values(["t"]).reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], 80),
            "t": rng.randint(0, 1000, 80).astype("int64"),
            "v": rng.randn(80).round(4),
        }
    )
    # merge_asof requires unique-ish ordering; drop same (k,t) dups so
    # the tie-break rule can't differ between implementations
    right = right.drop_duplicates(["k", "t"]).sort_values("t").reset_index(drop=True)
    right["rid"] = range(len(right))

    expected = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t")[["k", "t", "v"]],
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )

    ldf = spark.createDataFrame(left, "k string, t long")
    rdf = spark.createDataFrame(right, "k string, t long, v double, rid long")
    out = asof_join(
        ldf, rdf, on=["k"], left_time="t", right_time="t",
        right_cols=["v"], tiebreak="rid",
    ).toPandas()

    merged = expected.merge(
        out.rename(columns={"v_asof": "v_spark"}), on=["k", "t"], how="outer"
    )
    # group rows by (k,t): all must agree (NaN == NaN)
    for _, row in merged.iterrows():
        e, g = row["v"], row["v_spark"]
        assert (pd.isna(e) and pd.isna(g)) or e == g, row


def test_range_join_requires_keys(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        range_join(trades, quotes, on=[], left_time="t", right_time="t",
                   lower="1 hour", upper="0 seconds")


def test_range_join_hash_not_nested_loop(spark, sf_dir):
    """The equality key must keep the plan a hash/sort-merge join."""
    from another_map_reduce_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), "user_id", "ts"
    )
    joined = range_join(p, v, on=["user_id"], left_time="ts",
                        right_time="ts", lower="1 hour", upper="0 seconds")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_approx_distinct_tolerance(spark, sf_dir):
    from another_map_reduce_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(3, 0.1 * n), (et, approx[et], n)
