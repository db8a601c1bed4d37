"""Arbitrary stateful streaming via transformWithStateInPandas —
Spark 4's successor to applyInPandasWithState (stateful.py keeps the
classic API; both express the reference's "pluggable per-key logic"
need in a streaming world).

What the new API adds over the old one: named state variables managed
per-key by the handle (value/list/map state instead of one opaque
tuple), event-time and processing-time timers with a dedicated
callback, initial-state bootstrap, and TTL — and it REQUIRES the
RocksDB state store provider, which is also the production answer to
JVM-heap state pressure at scale (state lives off-heap/on-disk with
changelog checkpointing).

The demo operator is the SAME per-user funnel stage machine as
stateful.py's ``funnel_stages``; tests assert the two APIs and the
batch ``funnel_conversion`` query agree — three implementations, one
fixed point.

Environment dependency (honest gate, mirrors the PIL decode rung):
the new API's Python↔JVM state server speaks PROTOBUF
(``pyspark/sql/streaming/proto/StateMessage_pb2``), and protobuf is
not installed in this container (no new packages per the environment
brief; there is no pure-Python fallback because the wire format is
fixed by the JVM side).  The implementation below is complete and the
parity test runs wherever protobuf exists; here it self-skips with
the root cause recorded, and the classic applyInPandasWithState path
(stateful.py) carries the driver-visible proof of the semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

# One transition function, one schema, one sentinel — shared with the
# classic-API twin so the two implementations cannot drift.
from another_map_reduce_spark.streaming.stateful import (
    FUNNEL_OUT_SCHEMA,
    _UNSET,
    fold_funnel,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class FunnelProcessor(StatefulProcessor):
    """Per-user funnel stage machine on named value state.

    Delegates every transition to ``stateful.fold_funnel`` — the one
    shared implementation of the rules (first view, then first later
    click, then first later purchase; strict ``>`` on event time;
    concat-then-sort per (key, batch)) — so this API twin cannot
    drift from the classic one.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "funnel", "tv long, tc long, tp long"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        tv, tc, tp = (
            self._state.get() if self._state.exists() else (_UNSET,) * 3
        )
        tv, tc, tp = fold_funnel(tv, tc, tp, rows)
        self._state.update((tv, tc, tp))
        stage = (
            3 if tp != _UNSET else 2 if tc != _UNSET else 1 if tv != _UNSET else 0
        )
        yield pd.DataFrame({"user_id": [key[0]], "stage_idx": [stage]})

    def close(self) -> None:
        pass


def funnel_stages_v2(events: DataFrame) -> DataFrame:
    """``funnel_stages`` through transformWithStateInPandas.

    Caller must run the stream on a session configured with the
    RocksDB state store provider (``ROCKSDB_PROVIDER``) — the new API
    refuses the default HDFS-backed provider.
    """
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            FunnelProcessor(),
            outputStructType=FUNNEL_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
