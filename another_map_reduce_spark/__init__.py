"""another_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of ``josephsawaya/another-map-reduce``
(a Rust implementation of the MIT 6.824 MapReduce lab; see SURVEY.md).

The reference's capability surface is the two-stage MapReduce dataflow
(`/root/reference/src/worker.rs:23-38`): scan → flatMap → hash-shuffle →
sorted group-by-key → reduce → sink.  Here that surface is declared with
the DataFrame API so Catalyst/Tungsten choose the physical strategy, and
it is widened with the relational, dedup, similarity, text-analysis,
multimodal and streaming operators a large-scale training-data pipeline
needs (SURVEY.md §2b / §7).

Layout:
  session       SparkSession factory tuned for scale (AQE, Arrow, shuffle sizing)
  sources       table loaders / text ingestion mirroring the reference's sources
  functions     reusable column expressions (tokenize, cosine, shingles, ...)
  operators     MapReduce API, dedup, similarity, text analysis, multimodal
  plans         the relational query suite (oracle-checked)
  streaming     Structured Streaming ports of the batch pipeline
"""

from another_map_reduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
