"""As-of and range joins — [extension] custom temporal operators.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the classic Spark
mistake is an inequality theta-join that explodes into a broadcast
nested loop.  ``asof_join`` here is the scale-correct construction:

    union(left, right) → one sort-shuffle by (keys, time, side)
    → last_value(right cols, ignore nulls) window → filter left rows

One exchange + one in-partition sort, state O(1) per row — the same
plan shape a native as-of merge join would produce, expressed with
stock operators.  ``range_join`` keeps equality keys in the join
condition so Catalyst plans a hash join with the time bounds as a
post-join filter — never a nested loop when a key is present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with time ≤ (or <) left's.

    ``on``          equality keys (must be non-empty — they bound the
                    sort groups; a keyless as-of would be a total sort)
    ``right_cols``  columns to carry from the matched right row
    ``tiebreak``    right column ordering equal-time right rows
                    (last one wins) — REQUIRED for determinism if
                    right times can collide
    ``strict``      True → right_time strictly earlier (<), else ≤
    """
    marker = F.lit(1) if strict else F.lit(0)  # strict: right after left
    l_marked = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast("long").alias("_tb"),
        F.col(left_time).alias("_t"),
        (F.lit(1) if not strict else F.lit(0)).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_cols],
    )
    r_marked = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c)
          for c in left.columns],
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias("_tb"),
        F.col(right_time).alias("_t"),
        marker.alias("_side"),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    unioned = l_marked.unionByName(r_marked)
    # right rows sort before left at equal time (inclusive) or after
    # (strict); among right rows, tiebreak ascending so LAST = max.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_left = F.col("_side") == (1 if not strict else 0)
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
            for c in right_cols
        ],
    )
    return filled.where(is_left).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose time falls in
    [left_time − lower, left_time + upper).

    ``lower``/``upper`` are INTERVAL literals, e.g. ``"1 hour"``.
    The equality keys keep this a shuffled hash join (the bounds are a
    cheap post-join filter); without keys Spark would fall back to a
    nested loop — refuse that silently happening.
    """
    if not on:
        raise ValueError("range_join requires equality keys to stay hash-joinable")
    lt = F.col(f"__l.{left_time}")
    rt = F.col(f"__r.{right_time}")
    cond = (
        rt >= lt - F.expr(f"INTERVAL {lower}")
    ) & (rt < lt + F.expr(f"INTERVAL {upper}"))
    for k in on:
        cond = (F.col(f"__l.{k}") == F.col(f"__r.{k}")) & cond
    return left.alias("__l").join(right.alias("__r"), cond, how)
