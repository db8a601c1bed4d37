from another_map_reduce_spark.operators.wordcount import (
    word_count,
    word_count_bucketed,
)

__all__ = ["word_count", "word_count_bucketed"]
