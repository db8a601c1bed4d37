"""Central query registry — the engine's oracle-checked surface.

Every operator this engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) → DataFrame`` callable, optionally paired with the
ANSI-SQL string a DuckDB oracle runs on the same parquet tables.  The
driver hash-compares the two at sf=0.01; ``tools/verify_local.py``
replicates that check for fast local iteration.

Naming contract: every computed column is aliased identically in the
Spark code and the SQL (the driver sorts columns by name before
hashing).  Float aggregates are rounded on BOTH sides so summation
order can't flip a hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver's weaker rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the suite modules populates the registry.
def _load() -> None:
    import another_map_reduce_spark.plans.relational  # noqa: F401
    import another_map_reduce_spark.plans.reference_parity  # noqa: F401
    import another_map_reduce_spark.plans.pipeline  # noqa: F401


_load()
