"""Parquet table sources for the synthetic test corpus.

The reference's only source is a glob over local ``./files/*.txt``
(`/root/reference/src/coordinator.rs:216-224`), one map task per file.
Spark's FileSourceScan subsumes that (finer-grained splits, column
pruning, predicate pushdown), so the loaders here are thin: they exist
to centralise table names, keep schema expectations in one place, and
register temp views so every query is also runnable via ``spark.sql``.

At 100 TB these parquet reads are where most optimization happens —
the loaders deliberately return *lazy* DataFrames so Catalyst can push
filters/projections into the scan; nothing here forces materialisation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The ten driver-generated tables (TESTDATA.md). TPC-H-ish star schema
# plus events/documents/embeddings for the pipeline-extension operators.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (bounded
# cardinality in TPC-H: 5 regions, 25 nations). Join planners in
# plans/relational.py broadcast these explicitly.
ALWAYS_BROADCAST: frozenset[str] = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily load one synthetic table: ``{sf_dir}/{name}.parquet``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Sessions built outside get_spark (e.g. the driver's) may run in a
    # non-UTC timezone; collected TIMESTAMP values would then disagree
    # with the (naive-UTC) DuckDB oracle. Runtime-settable → set here.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # ... and their Python workers may not have this package on path.
    from another_map_reduce_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    if name == "events":
        # events stores TIMESTAMP(NANOS); sessions built outside
        # get_spark (e.g. the driver's) reject it without this conf.
        # It is runtime-settable, so set it defensively here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalise however this engine version surfaces the events
    table's TIMESTAMP(NANOS) column to a session-TZ TIMESTAMP.

    The ONE implementation for batch and streaming reads (duplicating
    it is a silent drift hazard: both paths must convert identically
    for the streaming query to hash-match the batch oracle).

    - ``bigint``: older readers honouring nanosAsLong — truncate ns to
      µs exactly as DuckDB does.
    - ``timestamp_ntz``: newer readers surface nanos as TIMESTAMP_NTZ
      (µs-truncated, naive) — cast to session-TZ TIMESTAMP; the
      session is pinned UTC by the loaders, so collected values equal
      the bigint path and instant-typed functions (unix_micros,
      window()) keep working.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get(ts_col)
    if ts_type == "bigint":
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    if ts_type == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns name → DataFrame.

    Mirrors the DuckDB oracle environment, where the same names are
    pre-registered, so ANSI ``oracle_sql()`` strings (65 of 116 — the
    rest use DuckDB list lambdas / md5-replay constructs) run verbatim
    via ``spark.sql`` against these views; value parity is asserted in
    tests/test_sql_entrypoint.py.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
