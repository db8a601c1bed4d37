"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (word count over documents —
the reference's one shipped job, /root/reference/src/worker.rs:23-38).
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) → DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent for the driver's differential check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from another_map_reduce_spark.queries import QUERIES

    return QUERIES["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from another_map_reduce_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    from another_map_reduce_spark.queries import ORACLES

    return dict(ORACLES)
