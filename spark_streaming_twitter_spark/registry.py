"""Query registry: the single source of truth for the engine's query surface.

Every operator from SURVEY.md §2 registers here as a (spark_fn, oracle_sql)
pair; ``__spark_entry__.py`` exposes the registry to the driver, and
``tests/test_oracle_parity.py`` replays the same comparison locally.

Oracle contract (driver): columns are sorted by name before the value hash,
so Spark and DuckDB results must agree on column NAMES and values but not
row/column order. Conventions enforced here by review:
- every computed column is aliased identically on both sides;
- DOUBLE outputs are rounded to a fixed number of decimals on both sides;
- TIMESTAMP outputs are cast to epoch seconds (BIGINT) on both sides;
- ranks/top-k always carry a deterministic tie-break on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, doc: str = "", bench: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a query + its DuckDB oracle twin."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


# The driver's correctness gate walks the registry in order and records ~50
# rows per round, so ordering IS coverage policy. Round-7 rotation
# rebalance: VERDICT r6 asks #2/#4/#5/#6 each require a *driver* row
# ("Done = green CORRECTNESS row"), so their 8 deliverable queries plus
# the two judge-named round-6 stragglers (hybrid_search_rrf,
# dedup_containment_pairs) are promoted into the 50-slot window; 40 of
# the 62 never-driver-tested round-6 queries fill the rest (task #1),
# and the 10 displaced round-6 entries queue immediately after, still
# ahead of the remaining round-7 additions and the driver-proven buffer.
_GATE_PRIORITY: tuple[str, ...] = (
    # (a) round-6 never-driver-tested debt, judge-named entries kept
    "part_zorder_cells",
    "stream_upsert_latest_state",
    "doc_wordpiece_tokens",
    "sketch_rollup_daily_users",
    "sketch_topk_event_types_merge",
    "sketch_theta_segment_overlap",
    "stream_incremental_availablenow_runs",
    "xml_format_roundtrip_stats",
    "sql_udf_discounted_revenue",
    "sql_table_function_big_orders",
    "copurchase_triangle_stats",
    "stream_events_pit_enrichment",
    "corpus_curation_pipeline_v3",
    "stream_topk_event_types_sketch",
    "ansi_try_arithmetic_audit",
    "supplier_hierarchy_rollup",
    "media_gif_lzw_roundtrip",
    "collation_word_forms",
    "keyword_search_bm25",
    "doc_charlm_score",
    "stream_funnel_match_stateful",
    "media_audio_features",
    "events_ewma_by_type",
    "stream_stream_full_join_conversions",
    "shipping_priority_topk",
    "product_type_profit",
    "observed_orders_metrics",
    "stream_user_hourly_quota",
    "events_anomaly_zscore",
    "user_event_type_diversity",
    "stream_unknown_user_events",
    "bpe_learned_merges",
    "event_type_drift_daily",
    "session_training_examples",
    "stream_union_two_sources",
    "stream_dual_sink_fanout",
    "embedding_pq_codes",
    "lineitem_feature_correlations",
    "similarity_pq_adc_topk",
    "media_mp4_sample_sizes",
    # (b) VERDICT r6 ask #2/#4/#5/#6 deliverables + judge-named stragglers
    "hybrid_search_rrf",
    "dedup_containment_pairs",
    "dedup_ngram_jaccard_pairs_capped",
    "dedup_containment_pairs_capped",
    "dpp_weekend_revenue_by_type",
    "dpp_pruned_partition_count",
    "stream_exactly_once_sink_replay",
    "stream_watermark_policy_join_trace",
    "stream_user_sliding_state_heap",
    "stream_user_sliding_state_rocksdb",
    # (c) displaced round-6 debt — first in line for round 8
    "event_values_winsorized",
    "stream_type_drift_hourly",
    "session_association_rules",
    "orders_snapshot_diff",
    "similarity_ivfpq_topk",
    "sql_correlated_excess_suppliers",
    "doc_bpe_encoded_stats",
    "ops_training_pipeline",
    "similarity_diversified_topk",
    "similarity_pq_recall",
    # (d) remaining round-6 overflow, then round-7 additions
    # ROUND7_NEW_MARKER — new round-7 queries insert before the buffer
    "events_interval_burst_stats",
    "doc_charlm_ccnet_buckets",
    "stream_rules_reload_enrichment",
    "sql_session_variables_revenue",
    "orders_constraint_audit",
    "copurchase_khop_features",
    "doc_unigram_viterbi_tokens",
    "corpus_curation_pipeline_v6",
    "udtf_table_arg_user_sessions",
    "sql_lateral_top_orders",
    "stream_hourly_value_p95",
    "stream_stream_semi_converted_signups",
    "incremental_rollup_maintenance",
    "segment_priority_independence",
    "sql_group_by_all_status_priority",
    "sql_parameterized_segment_revenue",
    "stream_progress_metrics",
    "copurchase_node_clustering",
    "event_interarrival_p99",
    "contrastive_negative_samples",
    "events_seasonality_profile",
    "embedding_sq8_codes",
    "similarity_sq8_topk",
    "similarity_sq8_recall",
    "dedup_lsh_candidate_recall",
    "dedup_quality_keeper_drop_list",
    "python_datasource_writer_roundtrip",
    "applyinarrow_type_quantiles",
    "stream_events_per_minute_rocksdb_changelog",
    "stream_session_windows_dynamic_gap",
    "corpus_curation_pipeline_v4",
    "user_event_type_map_profile",
    "nested_struct_pruning_stats",
    "doc_char_diversity",
    "dedup_chunk_keep_first",
    "doc_importance_weights",
    "dedup_tfidf_cosine_pairs",
    "doc_duplicate_chunk_fraction",
    "doc_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "corpus_curation_pipeline_v5",
    "dedup_cluster_size_histogram",
    "similarity_matryoshka_topk",
    "similarity_matryoshka_recall",
    "similarity_matryoshka_rerank_topk",
    "similarity_matryoshka_pool_recall",
    "quality_spearman_calibration",
    # (e) driver-proven rows, oldest evidence first (buffer)
    "stream_update_emission_trace",
    "similarity_ann_multiprobe_topk",
    "similarity_ann_recall_probed",
    "stream_sliding_counts_prebucket",
    "skewed_join_revenue_unsalted",
    "skewed_join_revenue_salted",
    "media_png_pixel_roundtrip",
    "dedup_semantic_within_cells",
    "python_datasource_shard_stats",
    "stream_hourly_from_minutely_chained",
    "python_stream_datasource_totals",
    "stream_events_per_minute_rocksdb",
    "similarity_ivf_nprobe_topk",
    "similarity_ivf_recall_nprobe",
    "media_wav_pcm_roundtrip",
    "media_mp4_box_stats",
    "stream_session_timeout_stateful",
    "similarity_topk_numpy",
    "approx_value_percentiles",
    "cogrouped_purchase_latency",
    "train_val_test_split",
    "doc_token_stats",
    "doc_quality_scores",
    "doc_lang_id",
    "doc_fingerprints",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_near_duplicates",
    "pricing_summary",
    "top_revenue_orders",
    "part_brand_revenue",
    "customers_with_orders",
    "customers_without_orders",
    "nation_region_rollup",
    "order_status_cube",
    "supplier_distinct_parts",
    "part_price_rank",
    "customer_running_spend",
    "top3_orders_per_priority",
    "customer_segment_set_ops",
    "part_string_functions",
    "orders_by_month",
    "top_lineitems_global",
    "priority_status_pivot",
    "above_avg_customers_per_nation",
    "sql_revenue_by_region",
    "events_gapfill_locf",
    "doc_quality_classifier",
    "stream_state_store_checkpoint",
    "media_jpeg_roundtrip",
    "weekly_cohort_retention",
    "user_event_sessions",
    "latest_event_per_user_type",
    "event_transition_matrix",
    "signup_view_purchase_funnel",
    "part_price_distribution",
    "user_value_intervals_scd2",
    "events_pit_enrichment",
    "orders_column_profile",
    "doc_repetition_scores",
    "doc_pii_redaction",
    "frequent_terms_heavy_hitters",
    "keyword_search_topk",
    "dedup_minhash_lsh_pairs_capped",
    "dedup_edit_distance_verify",
    "dedup_decontaminate",
    "dedup_ngram_jaccard_pairs",
    "dedup_drop_list",
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine_pairs",
    "dedup_group_ids",
    "dedup_group_ids_star",
    "corpus_curation_pipeline",
    "corpus_curation_pipeline_full",
    "dedup_graph_pagerank",
    "event_props_variant",
    "pipe_sql_returnflag_revenue",
    "udtf_token_positions",
    "events_moving_avg_1h",
    "pandas_udf_token_counts",
    "applyinpandas_source_ranks",
    "mapinarrow_byte_histograms",
    "media_byte_histograms",
    "media_meta_stats",
    "media_frame_samples",
    "tweet_hashtag_pipeline",
    "similarity_topk_cosine",
    "similarity_ann_lsh_topk",
    "similarity_ivf_topk",
    "embedding_kmeans_clusters",
    "stream_events_availablenow",
    "stream_tweet_trending_e2e",
    "pack_training_sequences",
    "doc_chunk_windows",
    "vocab_oov_rate",
    "stratified_split_exact",
    "source_temperature_weights",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query-defining module so the registry is fully populated.

    Returns the registry reordered so driver-unproven queries come first
    (see ``_GATE_PRIORITY``) — the round driver's correctness gate walks
    this dict in order and may stop before the end.
    """
    import spark_streaming_twitter_spark.operators.advanced  # noqa: F401
    import spark_streaming_twitter_spark.operators.analytics  # noqa: F401
    import spark_streaming_twitter_spark.operators.graph  # noqa: F401
    import spark_streaming_twitter_spark.operators.layout  # noqa: F401
    import spark_streaming_twitter_spark.operators.sketches  # noqa: F401
    import spark_streaming_twitter_spark.operators.modern  # noqa: F401
    import spark_streaming_twitter_spark.operators.pruning  # noqa: F401
    import spark_streaming_twitter_spark.operators.relational  # noqa: F401
    import spark_streaming_twitter_spark.operators.trending  # noqa: F401
    import spark_streaming_twitter_spark.operators.windows  # noqa: F401
    import spark_streaming_twitter_spark.dedup.dedup  # noqa: F401
    import spark_streaming_twitter_spark.functions.pandas_udfs  # noqa: F401
    import spark_streaming_twitter_spark.functions.sampling  # noqa: F401
    import spark_streaming_twitter_spark.multimodal.columns  # noqa: F401
    import spark_streaming_twitter_spark.sources.pysource  # noqa: F401
    import spark_streaming_twitter_spark.sources.tweets  # noqa: F401
    import spark_streaming_twitter_spark.similarity.kmeans  # noqa: F401
    import spark_streaming_twitter_spark.similarity.search  # noqa: F401
    import spark_streaming_twitter_spark.similarity.sq  # noqa: F401
    import spark_streaming_twitter_spark.streaming.queries  # noqa: F401
    import spark_streaming_twitter_spark.text.analysis  # noqa: F401
    import spark_streaming_twitter_spark.text.corpus  # noqa: F401

    missing = set(_GATE_PRIORITY) - QUERIES.keys()
    assert not missing, (
        f"_GATE_PRIORITY names absent from the registry (rename/typo?): "
        f"{sorted(missing)}"
    )
    # a duplicate name would silently shrink the ~50-slot gate budget
    assert len(set(_GATE_PRIORITY)) == len(_GATE_PRIORITY), (
        "_GATE_PRIORITY contains duplicates"
    )
    first = {n: QUERIES[n] for n in _GATE_PRIORITY}
    rest = {n: s for n, s in QUERIES.items() if n not in first}
    return {**first, **rest}
