"""Exact-summation aggregate helpers shared by the relational suites.

Doubles summed in partition order are not reproducible across engines;
summing in DECIMAL(38,6) is exact (order-free) and the single final
cast/divide produces identical doubles on any engine — the property
every hash-compared oracle in plans/ relies on.

Measured cost (sf0.1, local[32], fresh plan per run): ~0.35 µs per row
per decimal aggregate — a 7-sum scan-group over 600k lineitem rows runs
1.7 s in DECIMAL(38,6) vs 0.31 s with plain double sums, and a narrower
DECIMAL(18,6) input is NOT faster (Spark widens the sum buffer to
precision+10, so the accumulator leaves the long-backed fast path either
way; identical doubles, measured 1.6 s).  Catalyst deduplicates
textually identical aggregate expressions, so dsum+davg over the same
column costs ONE decimal sum, not two.  This is the deliberate price of
cross-engine bit-parity: a production deployment without a
hash-compared oracle swaps dsum/davg for F.sum/F.avg over doubles and
keeps the identical one-shuffle plan shape ~5× faster.  Long-scaled
integer sums (round(col·1e6) summed as BIGINT) would be fast AND exact
at bench scale but overflow int64 right at the 100 TB design point
(price sums reach ~6.6e20 scaled), so DECIMAL(38,6) is also the only
representation that survives the target scale.

Lives outside plans/ so suite modules can share it without importing
each other (plans modules import queries, which imports every plans
module — an inter-plans import is a latent cycle that breaks when a
user imports one plans module directly first).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dec(col: Column | str) -> Column:
    """Exact summation dtype: see module docstring."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(38,6)")


def dsum(col: Column | str, alias: str) -> Column:
    return F.sum(_dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    # sum exactly, divide two identical doubles → identical quotient
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_dec(c)).cast("double") / F.count(c)).alias(alias)
