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
# Round 12 rotation (same rolling policy as r4..r10; r11 failed to
# rotate — VERDICT r11 "What's wrong #1" — so its 50 rows re-checked
# the r10 cohort).  Row-age census after r11: 50 at r11, 49 at r9,
# 50 at r8, 50 at r7, 27 at r6, and the 4 r11 additions with no row
# at all.  This round's window: (1) queries added or semantically
# changed in r12 (no valid row), (2) the 4 r11 additions, (3) the
# whole r6 cohort (oldest rows, r6 driver order), (4) the head of
# the r7 cohort (r7 driver order) — exactly 50.
_ORDER_FRONT = [
    # r12 additions / semantic changes (no valid driver row):
    "stream_buslog_events_hourly",
    "multimodal_video_phash",
    "ann_ivf_incremental_approx",
    "udtf_sessionize_table_arg",
    # r11 additions that the failed r11 rotation never fronted:
    "udtf_sessionize_arrow",
    "stream_rate_soak_windows",
    "schema_evolution_widen",
    "multimodal_video_index",
    # r6 cohort (latest row r6 — the stalest in the registry):
    "ann_cosine_pairs",
    "ann_ivf_topk",
    "multimodal_meta",
    "multimodal_frames",
    "doc_winnowing_stats",
    "skew_salted_agg",
    "embedding_centroids",
    "bigram_lm_topk",
    "heavy_hitter_words",
    "split_train_val_test",
    "pii_redaction",
    "doc_chunks",
    "text_normalize_stats",
    "stratified_sample",
    "doc_repetition_stats",
    "decontam_overlap",
    "quality_filter_gopher",
    "domain_mix_report",
    "dup_substring_stats",
    "corpus_build_report",
    "semantic_dedup_stats",
    "stream_events_hourly_append",
    "multimodal_audio_meta",
    "stream_funnel_stateful",
    "cdc_upsert_balances",
    "udaf_median_doclen",
    "lm_novelty_score",
    # r7 cohort head (next-oldest, r7 driver order) — fills to 50:
    "ann_ivf_incremental",
    "dedup_containment",
    "histogram_quantile_rollup",
    "mr_wordcount",
    "pandas_wordcount",
    "pack_sequences_report",
    "stream_join_purchase_view",
    "pysource_wordcount",
    "wordcount",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_lead",
]
# Staged for the r13 window: the rest of the r7 cohort (r7 driver
# order), then the r8 cohort (r8 driver order).
_ORDER_NEXT_R12 = [
    "topk_global",
    "distinct_pairs",
    "set_intersect",
    "set_except",
    "set_union_all",
    "scalar_string_date_math",
    "scalar_case_bucket",
    "json_extract_agg",
    "events_hourly",
    "subquery_above_avg",
    "asof_last_purchase",
    "range_views_before_purchase",
    "session_windows_batch",
    "pivot_lang_source",
    "grouping_sets",
    "percentiles_by_priority",
    "q3_shipping_priority",
    "window_rank_family",
    "array_functions",
    "json_struct_parse",
    "q10_returned_items",
    "string_match_funcs",
    "null_handling",
    "cross_join_regions",
    "text_token_stats",
    "text_quality_by_lang",
    "lang_id_confusion",
    "dedup_exact_stats",
    "dedup_fingerprint_stats",
    "dedup_ngram_jaccard",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "stream_dedup_counts",
    # r8 cohort head:
    "pipeline_ingest_delta",
    "stream_static_join_segments",
    "recursive_calendar_gaps",
    "variant_props_stats",
    "sink_sorted_skipping",
    "embedding_quantize_stats",
    "data_profile_summary",
    "timeseries_gapfill_locf",
    "histogram_order_totals",
    "regression_by_flag",
    "pagerank_suppliers",
    "stream_sliding_counts",
    "window_ntile_deciles",
    "zorder_layout_skipping",
    "cumulative_unique_users",
    "event_transition_matrix",
]


def _reorder() -> None:
    front = [
        n for n in _ORDER_FRONT + _ORDER_NEXT_R12 if n in QUERIES
    ]
    mid = [n for n in QUERIES if n not in front]
    names = front + mid
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in names})


_load()
_reorder()
