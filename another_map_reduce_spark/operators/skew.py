"""Skew-handling utilities — 100 TB survival tools.

A single hot key (the empty-document fingerprint, the null user, the
viral item) turns one shuffle partition into the whole job's critical
path.  Two standard remedies, composable with any groupBy/join here:

* ``salted_agg``  — two-phase aggregation: spray each key across
                    ``salt`` sub-keys, partially aggregate, then
                    aggregate the partials.  Works for any algebraic
                    aggregate (sum/count/min/max — pass merge exprs).
* ``salted_join`` — replicate the small side ``salt``× with a salt
                    column, spray the big side's rows uniformly: the
                    hot key's rows land on ``salt`` different
                    partitions instead of one.

AQE's skew-join splitting (on in session.py) handles moderate skew
automatically; these are for the pathological keys AQE can't fix —
e.g. one key holding >1 executor-memory of rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt: pmod(hash(all columns), salt).

    Derived from row CONTENT, not ``monotonically_increasing_id`` —
    a task retry re-derives identical salts, so a retried stage can
    never re-spray rows mid-join.  Rows identical in every column
    collide onto one salt; that leaves them unsprayed but cannot
    affect correctness (they are indistinguishable anyway), and any
    differing column spreads a hot key's rows uniformly.
    """
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs``
    merge the partials per keys.  Example (count + sum):

        salted_agg(df, ["k"],
                   [F.count("*").alias("_n"), F.sum("v").alias("_s")],
                   [F.sum("_n").alias("n"), F.sum("_s").alias("s")])
    """
    salted = df.withColumn("_salt", _row_salt(df, salt))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: replicate ``small`` ``salt``×, spray ``big``.

    Correct for any join type whose semantics survive replication of
    the small side (inner/left with big on the left).  Cost: small
    side × salt — use only when a key is too hot for AQE.
    """
    sprayed = big.withColumn("_salt", _row_salt(big, salt))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = sprayed.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")
