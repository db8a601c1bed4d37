"""CDC / MERGE-style snapshot upsert — [extension].

The reference's sink is append-only text (`/root/reference/src/
worker.rs:144-154`); it cannot express mutation.  A training-data
pipeline maintains snapshots: apply a change feed (upserts + deletes)
onto a base table, latest change per key wins.  Lacking a transactional
table format, Spark expresses MERGE as a bounded-state composition:

1. Reduce the change feed to its latest row per key — one shuffle;
   ``row_number`` over a caller-supplied TOTAL order (version columns
   plus a unique tie-break), so "latest" is deterministic even when
   version timestamps collide.
2. Full-outer join base ↔ latest-changes on the key — a co-partitioned
   hash join; AQE broadcasts the reduced feed when a day's changes fit.
3. Resolve the four MERGE quadrants: matched+U → update, matched+D →
   delete, unmatched+U → insert, unmatched+D → no-op.

100 TB shape: the base is never sorted and never collected; extra state
is O(changed keys), not O(base).  The change feed shrinks to one row
per key BEFORE the join, so a hot key in the feed (many updates to one
row) collapses map-side of the wide join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_UPSERT = "U"
OP_DELETE = "D"


def upsert_latest(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    order_by: Sequence[str],
    payload_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a latest-wins change feed onto a base snapshot.

    ``base``: ``key`` + ``payload_cols``.  ``changes``: ``key`` +
    ``payload_cols`` + ``op_col`` (``'U'`` upsert / ``'D'`` delete) +
    ``order_by`` version columns.  ``order_by`` (descending, first
    column most significant) MUST be a total order within a key or the
    winner is nondeterministic — include a unique column last.

    Returns the merged snapshot with the base schema (key + payload).
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_by])
    # dedupe the projection: an order_by column may itself be a payload
    # column (latest-value-wins keyed on the value), and a duplicated
    # name would make the later c.<col> references ambiguous.
    head = [key, op_col, *payload_cols]
    extra_order = [c for c in order_by if c not in head]
    latest = (
        changes.select(*head, *extra_order)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", *extra_order)
    )
    b, c = base.alias("b"), latest.alias("c")
    joined = b.join(c, on=F.col(f"b.{key}") == F.col(f"c.{key}"), how="full_outer")
    # matched+D and unmatched+D drop; op NULL (base-only) and op='U' keep.
    kept = joined.where(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") == OP_UPSERT)
    )
    resolved = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    ] + [
        F.when(F.col(f"c.{op_col}") == OP_UPSERT, F.col(f"c.{p}"))
        .otherwise(F.col(f"b.{p}"))
        .alias(p)
        for p in payload_cols
    ]
    return kept.select(*resolved)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots of one table — the data-
    reconciliation complement of ``upsert_latest``: CDC APPLIES a
    change feed; this RECOVERS one from two table versions (regression
    testing a pipeline rewrite, validating a backfill, or deriving a
    feed where the source can't emit one).

    One full-outer co-partitioned join on the key (bucketed layouts
    remove even that at 100 TB), classifying each key as
    added / removed / changed / unchanged, with a per-compare-column
    change flag for the changed rows.  NULL-safe comparison via
    eqNullSafe, so NULL→value and value→NULL both count as changes.
    """
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ko_{k}") == F.col(f"_kn_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    changed_flags = [
        (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).alias(f"chg_{c}")
        for c in compare_cols
    ]
    any_change = None
    for c in compare_cols:
        t = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        any_change = t if any_change is None else (any_change | t)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keys = [
        F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
        for k in key_cols
    ]
    flags = [
        F.when(status == "changed", f).otherwise(F.lit(False)).alias(
            f"chg_{c}"
        )
        for c, f in zip(compare_cols, changed_flags)
    ]
    return j.select(*keys, status.alias("status"), *flags)
