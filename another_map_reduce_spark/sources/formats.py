"""File-format connectors beyond the reference's ``.txt`` source.

The reference reads only whole text files (`/root/reference/
src/coordinator.rs:216`, `README.md:36`) and writes only
space-separated text lines (`src/worker.rs:144-154`).  This module is
the [extension] connector surface: csv / json / parquet in, with
explicit schemas (never inference in production paths — inference is a
full extra pass over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-first CSV reader (PERMISSIVE: malformed rows → nulls —
    the typed analogue of the reference's silent bad-line skip,
    src/worker.rs:128-131)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Schema-first JSON-lines reader."""
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet (schema from footers; pushdown + pruning built in)."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC (schema from file metadata; predicate pushdown + column
    pruning built in, same scan machinery as parquet — ORC matters for
    Hive-ecosystem corpora where the upstream warehouse already stores
    ORC and a 100 TB rewrite to parquet would dwarf the query cost)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    """ORC writer (snappy by default, like parquet)."""
    df.write.mode(mode).orc(path)
