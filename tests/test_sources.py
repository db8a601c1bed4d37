from __future__ import annotations

from another_map_reduce_spark.sources.tables import TABLES, load_table, register_views
from another_map_reduce_spark.sources.text import read_text_corpus


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_register_views_sql_roundtrip(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n > 0


def test_whole_file_reading(spark, tmp_path):
    (tmp_path / "a.txt").write_text("line one\nline two")
    (tmp_path / "b.txt").write_text("solo")
    whole = read_text_corpus(spark, str(tmp_path / "*.txt"), whole_files=True)
    assert whole.count() == 2  # one row per file, like the reference map task
    lines = read_text_corpus(spark, str(tmp_path / "*.txt"), whole_files=False)
    assert lines.count() == 3
