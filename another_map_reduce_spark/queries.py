"""Central query registry — the engine's oracle-checked surface.

Every operator this engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) → DataFrame`` callable, optionally paired with the
ANSI-SQL string a DuckDB oracle runs on the same parquet tables.  The
driver hash-compares the two at sf=0.01; ``tools/verify_local.py``
replicates that check for fast local iteration.

Naming contract: every computed column is aliased identically in the
Spark code and the SQL (the driver sorts columns by name before
hashing).  Float aggregates are rounded on BOTH sides so summation
order can't flip a hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver's weaker rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the suite modules populates the registry.
def _load() -> None:
    import another_map_reduce_spark.plans.relational  # noqa: F401
    import another_map_reduce_spark.plans.tpch_extra  # noqa: F401
    import another_map_reduce_spark.plans.reference_parity  # noqa: F401
    import another_map_reduce_spark.plans.pipeline  # noqa: F401
    import another_map_reduce_spark.plans.datapipe  # noqa: F401
    import another_map_reduce_spark.plans.streaming_state  # noqa: F401
    import another_map_reduce_spark.plans.analytics  # noqa: F401


# The driver checks queries in iteration order and records exactly 50
# rows per round, so with 146+ registered queries every row goes stale
# after two rounds; each round fronts the queries whose latest driver
# row is oldest (plus brand-new queries, which have no row at all).
# All parked queries remain proven each round by the sf0.001
# differential suite and the driver-faithful local gate at sf0.01.
#
# Round 14 rotation (same rolling policy as r4..r13).  Row-age
# census after r13 (latest driver row per query): 50 at r13, 50 at
# r12, 49 at r11, 49 at r09, 38 at r08.  This round's window:
# (1) the r08 remainder — exactly last round's staged _ORDER_NEXT_R13,
# the cohort VERDICT r13 "Next round #8" names — then (2) the r09
# cohort head (r9 driver order) to fill to 50.
_ORDER_FRONT = [
    # r8 cohort remainder (latest row r08 — stalest in the registry):
    "window_ntile_deciles",
    "zorder_layout_skipping",
    "cumulative_unique_users",
    "event_transition_matrix",
    "funnel_time_to_convert",
    "graph_degree_distribution",
    "join_multiway",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_having",
    "join_broadcast_agg",
    "q22_dormant_customers",
    "q17_small_qty_revenue",
    "filter_project",
    "join_full_outer",
    "window_time_range_sum",
    "stream_events_hourly",
    "cohort_retention",
    "funnel_conversion",
    "approx_distinct_users",
    "sink_roundtrip_partitioned",
    "q2_min_price_part",
    "q4_priority_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q12_priority_linecount",
    "q15_top_supplier",
    "q18_large_volume_customer",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # r9 cohort head (next-oldest, r9 driver order) — fills to 50:
    "stream_session_close_tws",
    "ann_ivf_pq_topk",
    "graph_sssp_weighted",
    "graph_kcore_peel",
    "dedup_lsh_compact",
    "ann_ivf_append",
    "dedup_lsh_append",
    "pipeline_ingest_replay",
    "dedup_containment_incremental",
    "hybrid_retrieval_rrf",
    "dedup_simhash_incremental",
    "dedup_prefix_filter",
]
# Staged for the r15 window: the r09 cohort remainder (r9 driver
# order).  Census note for r15: after r14 lands, the oldest rows will
# be this list (r09), then the r11 cohort.
_ORDER_NEXT_R14 = [
    "kmv_theta_sketch_ops",
    "bpe_train_merges",
    "multimodal_phash_index",
    "embedding_rp_distortion",
    "constraint_audit",
    "bpe_encode_report",
    "snapshot_diff_orders",
    "incremental_agg_retraction",
    "timeseries_anomaly_zscore",
    "class_balanced_sample",
    "rp_ann_recall",
    "event_path_regex",
    "stream_late_data_accounting",
    "ann_ivf_rp_topk",
    "skew_diagnosis_report",
    "stream_session_windows",
    "market_basket_pairs",
    "graph_bfs_hops",
    "dpp_partitioned_join",
    "bucketed_join_colocated",
    "scd2_dimension_lookup",
    "cogroup_asof_pandas",
    "stream_join_outer_nulls",
    "pps_systematic_sample",
    "sql_udf_price_bands",
    "embedding_dim_correlation",
    "arrow_group_stats",
    "quantile_cutpoint_buckets",
    "bm25_retrieval",
    "scd2_order_history",
    "incremental_agg_maintenance",
    "fuzzy_lev1_neighbors",
    "unpivot_metrics",
    "dup_substring_removal",
    "pysource_stream_wordcount",
    "hll_sketch_rollup",
    "bloom_join_pruned_revenue",
]


def _reorder() -> None:
    front = [
        n for n in _ORDER_FRONT + _ORDER_NEXT_R14 if n in QUERIES
    ]
    mid = [n for n in QUERIES if n not in front]
    names = front + mid
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in names})


_load()
_reorder()
