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
