"""MERGE/upsert operator tests — all four quadrants + determinism.

The driver-checked query (cdc_upsert_balances) exercises update,
delete, and no-op change rows on real data, but the synthetic orders
feed references only existing customers — the INSERT quadrant never
fires there.  These synthetic cases pin all four quadrants and the
total-order tie-break.
"""

from __future__ import annotations

import pandas as pd

from another_map_reduce_spark.operators.cdc import upsert_latest


def _merge(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, "k long, v double")
    changes = spark.createDataFrame(
        change_rows, "k long, v double, op string, ver long, seq long"
    )
    out = upsert_latest(
        base, changes, key="k", order_by=("ver", "seq"), payload_cols=("v",)
    )
    return {r.k: r.v for r in out.collect()}


def test_upsert_four_quadrants(spark):
    got = _merge(
        spark,
        [(1, 10.0), (2, 20.0), (3, 30.0)],
        [
            (2, 99.0, "U", 5, 100),  # matched + U  → update
            (2, 55.0, "U", 4, 99),   # older change → must lose
            (3, 0.0, "D", 5, 101),   # matched + D  → delete
            (4, 40.0, "U", 5, 102),  # unmatched + U → insert
            (5, 0.0, "D", 5, 103),   # unmatched + D → no-op
        ],
    )
    assert got == {1: 10.0, 2: 99.0, 4: 40.0}


def test_upsert_latest_delete_beats_older_update(spark):
    got = _merge(
        spark,
        [(2, 20.0)],
        [(2, 77.0, "U", 8, 1), (2, 0.0, "D", 9, 2)],
    )
    assert got == {}


def test_upsert_tiebreak_total_order(spark):
    # Equal version: the unique seq column must decide, deterministically.
    got = _merge(
        spark,
        [(1, 10.0)],
        [(1, 111.0, "U", 5, 1), (1, 222.0, "U", 5, 2)],
    )
    assert got == {1: 222.0}


def test_funnel_fold_sorts_across_chunks():
    """Regression for the multi-chunk hazard: a later chunk's EARLIER
    event must fold before this chunk's events (global event-time sort
    per micro-batch), or a click preceding its view in chunk order is
    dropped by the stage machine."""
    from another_map_reduce_spark.streaming.stateful import _update_funnel

    class _FakeState:
        hasTimedOut = False

        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    t = pd.Timestamp("2024-01-01 00:00:00")
    chunk1 = pd.DataFrame(
        {"ts": [t + pd.Timedelta(seconds=10)], "event_type": ["click"]}
    )
    chunk2 = pd.DataFrame({"ts": [t], "event_type": ["view"]})
    out = list(_update_funnel((7,), iter([chunk1, chunk2]), _FakeState()))
    assert out[0]["stage_idx"].iloc[0] == 2
