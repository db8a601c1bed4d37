"""Similarity search over embedding columns — [extension].

Approximate-nearest-neighbor surface over an ``array<float>`` column:

* ``cosine_topk``     — brute-force exact top-k: broadcast the (small)
                        query set against the corpus, score JVM-side,
                        per-query heap via window row_number.  The
                        baseline and the ground truth for recall tests.
* ``cosine_pairs``    — all-pairs ≥ threshold within a (filtered)
                        corpus — embedding-space near-dup detection.
* ``ivf_topk``        — IVF-style scale path: corpus is partitioned by
                        nearest centroid; queries probe only the
                        ``nprobe`` closest cells, turning O(N·Q) into
                        O(N·Q·nprobe/C) at a measurable recall cost.

Scoring uses functions.vectors (zip_with/aggregate in double) — no
Python, bit-reproducible against DuckDB's list_dot_product.

At 100 TB the brute-force path is per-partition parallel with no
shuffle on the corpus side (queries broadcast); the IVF path adds one
corpus-side shuffle at build time (partition by cell), amortized
across all queries against the index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from another_map_reduce_spark.functions.vectors import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine, excluding self.

    Output: (qid, cid, cos, rank), rank 1..k, ties broken by cid
    (deterministic; with double-precision scores ties are theoretical).
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            cosine_similarity(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    Brute-force all-pairs — correct at any threshold but O(N²); at
    scale either pre-filter the corpus or use ivf/LSH blocking and
    accept recall < 1.
    """
    a = corpus.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"))
    b = corpus.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .select(
            "v1",
            "v2",
            cosine_similarity(F.col("e1"), F.col("e2")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .orderBy("v1", "v2")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k.

    Centroids are the ``num_cells`` lowest-id corpus vectors — a
    deterministic stand-in for k-means (no iterative training needed
    for a reproducible index; swap in k-means centroids at will).
    Every corpus vector is assigned to its nearest centroid; each
    query scores only vectors in its ``nprobe`` nearest cells.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(num_cells)
        .select(
            F.monotonically_increasing_id().alias("_tmp"),
            F.col(id_col).alias("cell_id"),
            F.col(vec_col).alias("cell_vec"),
        )
        .drop("_tmp")
    )
    cents_b = F.broadcast(cents)

    def nearest_cells(df: DataFrame, in_id: str, in_vec: str, n: int, out: str):
        scored = df.crossJoin(cents_b).select(
            F.col(in_id),
            F.col(in_vec),
            F.col("cell_id"),
            cosine_similarity(F.col(in_vec), F.col("cell_vec")).alias("csim"),
        )
        w = Window.partitionBy(in_id).orderBy(
            F.col("csim").desc(), F.col("cell_id")
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .where(F.col("crank") <= n)
            .select(F.col(in_id), F.col(in_vec), F.col("cell_id").alias(out))
        )

    c_cells = nearest_cells(
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")),
        "cid",
        "cvec",
        1,
        "cell",
    )
    q_cells = nearest_cells(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
        "qid",
        "qvec",
        nprobe,
        "cell",
    )
    scored = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            cosine_similarity(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
        .dropDuplicates(["qid", "cid"])
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
    )
