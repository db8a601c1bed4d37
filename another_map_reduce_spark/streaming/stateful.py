"""Custom stateful streaming operator via applyInPandasWithState.

``session_window`` (windows.py) covers gap-based sessions natively;
this module is the escape hatch the reference's pluggable map/reduce
would need for arbitrary per-key streaming state: a user-defined
update function over (key, event batch, persistent state) with
timeout-driven eviction — Spark's GroupState manages fault-tolerant
state in the state store, we only define the transition function.

Example operator: running per-user event counter with totals, emitting
one updated row per user per micro-batch and expiring idle users via
processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _make_update_user(evict_ms: int | None):
    def _update_user(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Transition fn: fold the batch into (n, total) persistent state."""
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return _update_user


def sessionize(events: DataFrame, evict_after_ms: int | None = None) -> DataFrame:
    """Running per-user totals with stateful eviction.

    Input: streaming (user_id, value, ...) frame.  Output: one row per
    user per micro-batch with counts-so-far — the streaming analogue
    of ``groupBy(user).agg(count, sum)`` but with custom state you can
    extend to arbitrary logic (dedup windows, CDC merge, ML feature
    accumulation...).

    ``evict_after_ms`` turns on processing-time state eviction for
    idle keys.  NOTE: with a timeout configured Spark schedules
    recurring timeout-check micro-batches, so ``processAllAvailable``
    on an otherwise-idle stream never sees the query go idle — leave
    it off for drain-and-assert test harnesses.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user(evict_after_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming funnel: per-user stage machine
# ---------------------------------------------------------------------------

FUNNEL_OUT_SCHEMA = "user_id long, stage_idx integer"
# micros since epoch; -1 = stage not reached
FUNNEL_STATE_SCHEMA = "t_view long, t_click long, t_purchase long"

_UNSET = -1


def _update_funnel(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch of one user's events into the funnel state
    (first view → first later click → first later purchase).

    Events are folded in event-time order within the batch; with
    per-user event-time-ordered delivery across batches (the watermark
    discipline upstream enforces) the fixed point equals the batch
    ``funnel_conversion`` stages: processing in ts order makes "first
    eligible seen" ≡ "MIN(ts) satisfying the predicate".
    """
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    tv, tc, tp = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    tv, tc, tp = fold_funnel(tv, tc, tp, pdfs)
    state.update((tv, tc, tp))
    stage = 3 if tp != _UNSET else 2 if tc != _UNSET else 1 if tv != _UNSET else 0
    yield pd.DataFrame({"user_id": [key[0]], "stage_idx": [stage]})


def fold_funnel(
    tv: int, tc: int, tp: int, pdfs: Iterable[pd.DataFrame]
) -> tuple[int, int, int]:
    """Fold a micro-batch of (ts, event_type) chunks into the funnel
    state — THE transition function, shared by both streaming APIs
    (``_update_funnel`` here and stateful_v2.FunnelProcessor) so the
    rules cannot drift between them.

    A group's micro-batch rows arrive as MULTIPLE Arrow chunks when
    they span record batches; sorting per-chunk would fold a later
    chunk's earlier events after this chunk (a click seen before its
    view is dropped by the stage machine).  Concatenate, THEN sort —
    one global event-time order per (key, micro-batch).  Ties in ts
    are harmless whatever their order: every transition uses strict
    ``>`` against the previous stage, so equal-ts events record the
    same state either way.
    """
    chunks = [pdf[["ts", "event_type"]] for pdf in pdfs]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, etype in batch.itertuples(index=False):
            # pandas Timestamp (.value = ns) or raw int64 nanos (from
            # nanosAsLong sessions) — either way: ns → µs
            t = int(ts.value if hasattr(ts, "value") else ts) // 1000
            if etype == "view" and tv == _UNSET:
                tv = t
            elif etype == "click" and tv != _UNSET and tc == _UNSET and t > tv:
                tc = t
            elif (
                etype == "purchase"
                and tc != _UNSET
                and tp == _UNSET
                and t > tc
            ):
                tp = t
    return tv, tc, tp


def funnel_stages(events: DataFrame) -> DataFrame:
    """Streaming twin of ``plans.relational.funnel_conversion``: one
    (user_id, stage_idx) row per user per micro-batch, stage_idx the
    deepest funnel stage reached so far (0 = none, 3 = full funnel).

    State is three longs per user — O(users) state-store footprint, no
    event retention — so the operator is watermark-friendly and the
    state store stays bounded no matter how long the stream runs.
    """
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
