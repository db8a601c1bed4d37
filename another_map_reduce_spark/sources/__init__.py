from another_map_reduce_spark.sources.tables import TABLES, load_table, register_views
from another_map_reduce_spark.sources.text import read_text_corpus

__all__ = ["TABLES", "load_table", "register_views", "read_text_corpus"]
