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


def test_compressed_text_and_csv_roundtrip(spark, tmp_path):
    """gzip'd text/CSV read transparently (codec from the extension) and
    produce the same rows as the uncompressed file.

    Scale note asserted implicitly: .gz is NOT splittable — one file =
    one task — so large corpora should be many medium gz files (or zstd
    parquet); the read path itself is identical.
    """
    import gzip

    (tmp_path / "plain.txt").write_text("alpha beta\ngamma")
    with gzip.open(tmp_path / "zipped.txt.gz", "wt") as f:
        f.write("alpha beta\ngamma")
    plain = {r.value for r in spark.read.text(str(tmp_path / "plain.txt")).collect()}
    zipped = {
        r.value for r in spark.read.text(str(tmp_path / "zipped.txt.gz")).collect()
    }
    assert plain == zipped == {"alpha beta", "gamma"}

    with gzip.open(tmp_path / "t.csv.gz", "wt") as f:
        f.write("k,v\n1,x\n2,y\n")
    rows = (
        spark.read.option("header", True)
        .csv(str(tmp_path / "t.csv.gz"))
        .collect()
    )
    assert {(r.k, r.v) for r in rows} == {("1", "x"), ("2", "y")}
