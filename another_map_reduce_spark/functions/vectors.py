"""Vector expressions over ``array<float>`` embedding columns.

[extension] — the reference has no vector/array types (SURVEY.md §1);
these support the similarity-search and embedding-dedup operators.

All three are pure Column expressions built from ``zip_with`` /
``aggregate`` higher-order functions: they run JVM-side per row with no
Python round-trip, so a brute-force scorer over them is shuffle-free
and codegen-friendly.  Elements are cast to double *before* any
arithmetic so results are bit-reproducible against any double-precision
oracle (same left-to-right summation order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, summed in index order."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); null-safe only insofar as inputs are non-empty."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
