"""Event-time windowed aggregations with watermarks — [extension].

Tumbling / sliding / session windows over an event stream, with a
watermark bounding state: events later than the watermark horizon are
dropped and their window state evicted — the knob the reference (batch
only) never needs, and the one that makes unbounded aggregation
feasible at scale (state size ∝ active windows, not stream length).

These functions take any DataFrame with (ts, event_type, value)
columns — batch or streaming — because windowed aggregation is the
same declarative plan in both modes; tests exploit that by checking
the streaming result against the batch result of the same function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Non-overlapping event-time buckets: count + sum(value) per
    (window, event_type)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping windows (each event lands in window/slide buckets)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows: per-user activity bursts separated by ≥ gap.

    ``session_window`` merges adjacent events dynamically — state is
    one open session per user, closed (and emitted) once the watermark
    passes its gap horizon.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window(ts_col, gap).alias("sess"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
