"""spark.sql entry-point parity: the same tables are queryable through
raw SQL over registered views, and for every oracle string that is
ANSI enough to parse in BOTH engines, `spark.sql(oracle)` must produce
exactly the DataFrame-API query's result — the strongest possible
dual-entry-point check (one SQL text, two engines, three surfaces)."""

from __future__ import annotations


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows)


def test_oracle_sql_runs_via_spark_sql(spark, sf_dir):
    from another_map_reduce_spark.queries import ORACLES, QUERIES
    from another_map_reduce_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    parseable = {}
    for name, sql in ORACLES.items():
        try:
            spark.sql(sql).schema  # analysis only
            parseable[name] = sql
        except Exception:
            continue  # DuckDB-specific syntax (list lambdas, md5 replay…)
    # the SQL surface is a first-class entry point, not a lucky few
    assert len(parseable) >= 50, f"only {len(parseable)} oracles parse"

    # full value parity for a family-spanning sample (keeps runtime sane)
    sample = [
        "filter_project",
        "q1_pricing_summary",
        "agg_distinct",
        "agg_having",
        "join_broadcast_agg",
        "join_multiway",
        "join_left_outer",
        "join_full_outer",
        "join_semi",
        "window_time_range_sum",
        # r5 additions — incl. the unrolled-CTE PageRank: one SQL
        # text produces identical values through DuckDB, spark.sql,
        # and (for the DataFrame twin) the API surface
        "histogram_order_totals",
        "regression_by_flag",
        "pagerank_suppliers",
        "window_ntile_deciles",
        "cumulative_unique_users",
        "event_transition_matrix",
        "graph_degree_distribution",
        # r6 additions whose oracle text is ANSI enough for both
        "bloom_join_pruned_revenue",
        "skew_join_aqe",
    ]
    for name in sample:
        assert name in parseable, f"{name} no longer parses in spark.sql"
        via_sql = _canon(spark.sql(parseable[name]))
        via_df = _canon(QUERIES[name](spark, sf_dir))
        assert via_sql == via_df, f"{name}: spark.sql != DataFrame API"
