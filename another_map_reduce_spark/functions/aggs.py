"""Exact-summation aggregate helpers shared by the relational suites.

Doubles summed in partition order are not reproducible across engines;
summing in DECIMAL(38,6) is exact (order-free) and the single final
cast/divide produces identical doubles on any engine — the property
every hash-compared oracle in plans/ relies on.

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
