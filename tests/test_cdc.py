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


# ---------------------------------------------------------------------------
# Property: upsert_latest ≡ a sequential pure-Python MERGE replay
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),            # key
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6),         # value
        st.sampled_from(["U", "D"]),                      # op
        st.integers(min_value=0, max_value=3),            # version (collides)
    ),
    max_size=20,
)
_BASE = st.dictionaries(
    st.integers(min_value=1, max_value=6),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6),
    max_size=4,
)


def _py_merge(base: dict, changes: list) -> dict:
    """Sequential replay in (ver, seq) order — the semantics MERGE has
    when changes are applied one at a time."""
    snap = dict(base)
    # sort by (ver, arrival position) — NOT changes.index(c), which
    # returns the FIRST occurrence for duplicate tuples and would
    # replay duplicates out of order.
    for _pos, (k, v, op, _ver) in sorted(
        enumerate(changes), key=lambda t: (t[1][3], t[0])
    ):
        if op == "U":
            snap[k] = v
        else:
            snap.pop(k, None)
    return snap


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=_BASE, changes=_CHANGES)
def test_upsert_matches_sequential_replay(spark, base, changes):
    """Latest-wins reduce ≡ full sequential replay: only the final
    change per key can matter, so the one-window-one-join plan must
    agree with applying every change in order."""
    base_rows = [(k, v) for k, v in base.items()]
    change_rows = [
        (k, v, op, ver, seq) for seq, (k, v, op, ver) in enumerate(changes)
    ]
    expected = _py_merge(base, changes)
    if not change_rows:
        got = base
    else:
        b = spark.createDataFrame(base_rows, "k long, v double") if base_rows \
            else spark.createDataFrame([], "k long, v double")
        c = spark.createDataFrame(
            change_rows, "k long, v double, op string, ver long, seq long"
        )
        out = upsert_latest(
            b, c, key="k", order_by=("ver", "seq"), payload_cols=("v",)
        )
        got = {r.k: r.v for r in out.collect()}
    assert got == expected


def test_upsert_order_by_overlaps_payload(spark):
    """order_by may include a payload column (latest-VALUE-wins):
    the projection must not duplicate the column name."""
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    changes = spark.createDataFrame(
        [(1, 5.0, "U", 100), (1, 7.0, "U", 101)],
        "k long, v double, op string, seq long",
    )
    out = upsert_latest(
        base, changes, key="k", order_by=("v", "seq"), payload_cols=("v",)
    )
    assert {r.k: r.v for r in out.collect()} == {1: 7.0}


# ---------------------------------------------------------------------------
# Property: fold_funnel is chunking-invariant and matches a replay oracle
# ---------------------------------------------------------------------------

_EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(min_value=0, max_value=9),  # seconds; collisions likely
    ),
    max_size=12,
)


def _py_funnel(events):
    """Sequential oracle: fold ts-sorted events through the stage rules."""
    UNSET = -1
    tv = tc = tp = UNSET
    for etype, t in sorted(events, key=lambda e: e[1]):
        if etype == "view" and tv == UNSET:
            tv = t
        elif etype == "click" and tv != UNSET and tc == UNSET and t > tv:
            tc = t
        elif etype == "purchase" and tc != UNSET and tp == UNSET and t > tc:
            tp = t
    return 3 if tp != UNSET else 2 if tc != UNSET else 1 if tv != UNSET else 0


@settings(max_examples=60, deadline=None)
@given(events=_EVENTS, data=st.data())
def test_fold_funnel_chunking_invariant(events, data):
    """fold_funnel must reach the sequential oracle's stage regardless
    of how the micro-batch is split into Arrow-chunk DataFrames —
    the multi-chunk hazard, property-tested (ts ties included: the
    strict-> transitions make tie order irrelevant)."""
    from another_map_reduce_spark.streaming.stateful import (
        _UNSET,
        fold_funnel,
    )

    # random chunking of the event list
    chunks, rest = [], list(events)
    while rest:
        k = data.draw(st.integers(min_value=1, max_value=len(rest)))
        head, rest = rest[:k], rest[k:]
        chunks.append(
            pd.DataFrame(
                {
                    "ts": [t * 1000 for _, t in head],  # int64 nanos path
                    "event_type": [e for e, _ in head],
                }
            )
        )
    tv, tc, tp = fold_funnel(_UNSET, _UNSET, _UNSET, iter(chunks))
    got = 3 if tp != _UNSET else 2 if tc != _UNSET else 1 if tv != _UNSET else 0
    # the DataFrame side's ns scaling (t*1000) is undone by the fold's
    # ns→µs division, so the oracle folds the raw seconds directly
    assert got == _py_funnel(events)


def test_snapshot_diff_classifies_all_quadrants(spark):
    """Each diff class on a crafted pair of snapshots, including the
    NULL-safe column comparison (NULL -> value is a change)."""
    from another_map_reduce_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "b", None),   # value appears in new -> changed
            (3, "c", 3.0),    # removed
            (4, "d", 4.0),    # unchanged
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a2", 1.0),   # status change only
            (2, "b", 2.0),    # NULL -> 2.0 price change
            (4, "d", 4.0),
            (5, "e", 5.0),    # added
        ],
        "k long, s string, v double",
    )
    rows = {
        r.k: r
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert rows[1].status == "changed" and rows[1].chg_s and not rows[1].chg_v
    assert rows[2].status == "changed" and not rows[2].chg_s and rows[2].chg_v
    assert rows[3].status == "removed"
    assert rows[4].status == "unchanged"
    assert rows[5].status == "added"
    assert not rows[3].chg_s and not rows[5].chg_v  # flags false outside 'changed'
