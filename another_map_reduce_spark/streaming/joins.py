"""Stream-stream joins and streaming dedup — [extension].

Two more stateful streaming primitives the batch suite already proves
semantics for:

* ``purchases_with_recent_view`` — stream-stream inner join with a
  time-range condition: purchases matched to a view by the same user
  within the preceding hour.  Both sides carry watermarks so the join
  state (buffered rows awaiting matches) is bounded and evicted.
* ``dedup_stream`` — exactly-once-per-key emission with
  ``dropDuplicatesWithinWatermark``: duplicate events arriving within
  the watermark horizon are suppressed; state for keys older than the
  horizon is evicted (infinite-stream-safe, unlike plain
  dropDuplicates whose state grows forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_view(
    purchases: DataFrame, views: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Purchases that had a view by the same user within the prior hour.

    The range condition bounds how long a view must be buffered; the
    watermarks let Spark drop view-state older than (watermark + 1h).
    """
    p = purchases.withWatermark("ts", watermark).alias("p")
    v = views.withWatermark("ts", watermark).alias("v")
    cond = (
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v.ts") < F.col("p.ts"))
    )
    return p.join(v, cond, "inner").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("v.ts").alias("view_ts"),
    )


def purchases_with_view_outer(
    purchases: DataFrame, views: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase, with its prior-
    hour views where they exist.

    The outer contract is what makes this stateful in a way the inner
    join isn't: an unmatched purchase CANNOT emit on arrival (a
    matching view may still come), so Spark buffers it and emits the
    null-padded row only when the watermark proves no match can
    arrive — for this condition (v.ts < p.ts) that is when the
    watermark passes p.ts.  Matched pairs emit immediately, exactly
    like the inner join.
    """
    p = purchases.withWatermark("ts", watermark).alias("p")
    v = views.withWatermark("ts", watermark).alias("v")
    cond = (
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v.ts") < F.col("p.ts"))
    )
    return p.join(v, cond, "leftOuter").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("v.ts").alias("view_ts"),
    )


def dedup_stream(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    Emits the first arrival of each key; duplicates within the
    watermark horizon are dropped, and key-state beyond it is evicted.
    (The streaming face of operators/dedup.dedup_exact.)
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def purchases_with_view_full(
    purchases: DataFrame, views: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """FULL OUTER stream-stream join — both sides' unmatched rows
    survive: every purchase with its prior-hour views, every view with
    its next-hour purchases, and null-padded rows for whichever side
    never matched.

    State/emission semantics (empirically pinned by
    tests/test_streaming.py::test_full_outer_join_eviction_boundaries,
    the left-outer's probe discipline): with joint watermark
    wm = min(max purchase ts, max view ts) − delay,

    - an unmatched PURCHASE emits when p.ts <= wm — a matching view
      would need v.ts < p.ts <= wm, which the late-data filter
      (drops ts < wm) makes impossible;
    - an unmatched VIEW emits when v.ts + 1h < wm (STRICT) — its
      match window is p.ts ∈ (v.ts, v.ts + 1h], and a purchase at
      exactly p.ts = wm is still admissible, so the window must lie
      strictly below wm before the view can close.

    The asymmetry (<= vs <) is the join condition's, not Spark's:
    each side closes exactly when the late-data filter proves its
    remaining match window empty.
    """
    p = purchases.withWatermark("ts", watermark).alias("p")
    v = views.withWatermark("ts", watermark).alias("v")
    cond = (
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v.ts") < F.col("p.ts"))
    )
    return p.join(v, cond, "fullOuter").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.user_id").alias("p_user"),
        F.col("v.user_id").alias("v_user"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("v.ts").alias("view_ts"),
    )
