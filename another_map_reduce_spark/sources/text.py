"""Plain-text ingestion, mirroring the reference's source semantics.

The reference enumerates ``./files/*.txt`` and each map task reads one
whole file into a string (`/root/reference/src/coordinator.rs:216-224`,
`src/worker.rs:93`).  Two Spark expressions of that:

* ``read_text_corpus(..., whole_files=True)`` — one row per file
  (path, content), the literal analogue of the reference's
  file-at-a-time map input.
* ``read_text_corpus(..., whole_files=False)`` — one row per line via
  the built-in text source; splittable, so at 100 TB a single huge file
  still parallelises (the reference's 1-file-1-task scheme would not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = False
) -> DataFrame:
    """Read a text corpus into ``(path, text)`` or line-oriented rows.

    ``path`` may be a glob such as ``/data/files/*.txt`` — the same
    shape the reference consumes (`src/coordinator.rs:216`).
    """
    if whole_files:
        # wholetext keeps the reference's file-at-a-time record shape;
        # fine for many medium files, NOT for one giant file (unsplittable).
        return (
            spark.read.text(path, wholetext=True)
            .select(
                F.input_file_name().alias("path"),
                F.col("value").alias("text"),
            )
        )
    return spark.read.text(path).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
