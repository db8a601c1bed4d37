from another_map_reduce_spark.functions.text import (
    TOKEN_SEPARATOR_PATTERN,
    tokenize,
    tokens_column,
)
from another_map_reduce_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "TOKEN_SEPARATOR_PATTERN",
    "tokenize",
    "tokens_column",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
