from another_map_reduce_spark.streaming.wordcount import streaming_word_count
from another_map_reduce_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from another_map_reduce_spark.streaming.stateful import sessionize

__all__ = [
    "streaming_word_count",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "sessionize",
]

from another_map_reduce_spark.streaming.joins import (  # noqa: E402
    dedup_stream,
    purchases_with_recent_view,
)

__all__ += ["dedup_stream", "purchases_with_recent_view"]
