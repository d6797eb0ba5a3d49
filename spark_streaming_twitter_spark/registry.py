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


# Queries whose SEMANTICS changed since their newest green driver row —
# their old evidence no longer proves the current code, so gate_order
# treats them exactly like never-tested debt (fronted before every proven
# query) until a fresh green row lands, at which point the name should be
# removed from this tuple. Round 15: the skewed-rebalance family's step
# count became contractual (fixed K=5, was loop-until-threshold; VERDICT
# r14 #1) — same rows at sf0.01, but the gate must re-prove that, not
# inherit r13's evidence.
# Also round 15: similarity_index_structure_curve grew the SQ8 and
# matryoshka tiers (schema + oracle extended), so its r14 evidence is
# stale.
_RECHECK_FIRST: tuple[str, ...] = (
    "similarity_index_structure_curve",
    "ivf_rebalance_skewed_trajectory",
    "similarity_ivf_topk_skewed_rebalanced",
    "similarity_ivf_skewed_probe_cost",
    "similarity_ivf_skewed_recall",
    "similarity_ivf_skewed_nprobe2_recall",
)

# The driver's correctness gate walks the registry in order and records ~50
# rows per round, so ordering IS coverage policy. Since round 9 the order is
# DYNAMIC: ``gate_order`` reads the committed CORRECTNESS_r*.json files and
# fronts every query with no green driver row, so the gate always reaches
# new debt without a manual rotation commit. This tuple is only the
# tie-break within each (unproven, proven) bucket; names not yet listed
# here sort after listed peers in their bucket by registration order.
_GATE_PRIORITY: tuple[str, ...] = (
    # (a) never-driver-tested debt: 45 round-7 additions + 12 round-6 leftovers
    "event_values_winsorized",
    "event_interarrival_p99",
    "user_event_type_map_profile",
    "events_interval_burst_stats",
    "session_association_rules",
    "ops_training_pipeline",
    "incremental_rollup_maintenance",
    "segment_priority_independence",
    "events_seasonality_profile",
    "orders_constraint_audit",
    "contrastive_negative_samples",
    "doc_char_diversity",
    "doc_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "quality_spearman_calibration",
    "doc_charlm_ccnet_buckets",
    "doc_unigram_viterbi_tokens",
    "corpus_curation_pipeline_v6",
    "dedup_lsh_candidate_recall",
    "dedup_quality_keeper_drop_list",
    "corpus_curation_pipeline_v4",
    "dedup_chunk_keep_first",
    "dedup_tfidf_cosine_pairs",
    "doc_duplicate_chunk_fraction",
    "doc_bpe_encoded_stats",
    "doc_importance_weights",
    "corpus_curation_pipeline_v5",
    "dedup_cluster_size_histogram",
    "copurchase_node_clustering",
    "copurchase_khop_features",
    "udtf_table_arg_user_sessions",
    "nested_struct_pruning_stats",
    "orders_snapshot_diff",
    "sql_correlated_excess_suppliers",
    "sql_group_by_all_status_priority",
    "sql_parameterized_segment_revenue",
    "sql_session_variables_revenue",
    "sql_lateral_top_orders",
    "applyinarrow_type_quantiles",
    "python_datasource_writer_roundtrip",
    "similarity_diversified_topk",
    "similarity_matryoshka_topk",
    "similarity_matryoshka_recall",
    "similarity_matryoshka_rerank_topk",
    "similarity_matryoshka_pool_recall",
    "similarity_ivfpq_topk",
    "similarity_pq_recall",
    "embedding_sq8_codes",
    "similarity_sq8_topk",
    "similarity_sq8_recall",
    "stream_type_drift_hourly",
    "stream_stream_semi_converted_signups",
    "stream_progress_metrics",
    "stream_events_per_minute_rocksdb_changelog",
    "stream_session_windows_dynamic_gap",
    "stream_rules_reload_enrichment",
    "stream_hourly_value_p95",
    # ROUND8_NEW_MARKER — new round-8 queries insert here
    "media_phash_codes",
    "media_phash_dup_pairs",
    "dedup_span_removal",
    "corpus_curation_pipeline_v7",
    "media_audio_fingerprints",
    "media_audio_dup_pairs",
    "media_phash_group_keeper",
    "media_video_frame_signatures",
    "media_video_dup_pairs",
    "stream_media_phash_ingest_dedup",
    "bloom_join_urgent_revenue",
    "media_curation_ledger",
    "sql_script_threshold_search",
    "dedup_prefix_filter_pairs",
    "similarity_filtered_topk",
    "similarity_postfilter_loss",
    # round-9 additions (tie-break order; the dynamic sort fronts them
    # while they lack a green driver row)
    "stream_text_minhash_ingest_dedup",
    "similarity_filtered_ivf_topk",
    "similarity_filtered_ivf_recall",
    "similarity_filtered_lsh_topk",
    "media_caption_drop_propagation",
    "corpus_curation_pipeline_v8",
    "semantic_decontaminate",
    # round-10 additions (tie-break order; protobuf-gated queries like
    # stream_text_minhash_self_dedup stay OFF this tuple — load_all asserts
    # every tuple name is registered, which would fail on a bare host)
    "stream_media_audio_ingest_dedup",
    "stream_media_video_ingest_dedup",
    "semantic_decontaminate_ann",
    "semantic_decontaminate_ann_recall",
    "stream_decontaminate_ingest",
    "stream_text_minhash_self_dedup_batchidx",
    "stream_text_minhash_keeper_dedup",
    "stream_quality_gate_ingest",
    "stream_embedding_index_ingest",
    "stream_corpus_ingest_pipeline",
    "stream_centroid_maintenance",
    # round-11 additions (tie-break order; protobuf-gated queries —
    # stream_text_minhash_self_dedup_unordered, stream_media_phash_ttl_dedup
    # — stay OFF this tuple, same bare-host rule as round 10)
    "stream_media_phash_keeper_dedup",
    "stream_caption_drop_propagation",
    "stream_cell_split_maintenance",
    "stream_media_audio_keeper_dedup",
    "stream_media_video_keeper_dedup",
    "stream_media_curation_report",
    "stream_text_minhash_keeper_dedup_unordered",
    "stream_pack_training_sequences",
    # round-12 additions (tie-break order; protobuf-gated tws queries —
    # the bounded-disorder TTL and the three media unordered TTLs —
    # stay OFF this tuple, same bare-host rule as rounds 10/11)
    "stream_media_phash_keeper_dedup_unordered",
    "stream_media_audio_keeper_dedup_unordered",
    "stream_media_video_keeper_dedup_unordered",
    "pack_training_sequences_ranged",
    "similarity_ivf_topk_postsplit",
    "similarity_ivf_split_probe_cost",
    "stream_corpus_ingest_pipeline_unordered",
    "stream_media_curation_report_unordered",
    "similarity_ivf_split_nprobe2_recall",
    "stream_cell_split_rebalance",
    "similarity_ivf_topk_postrebalance",
    "training_sequence_manifest",
    "ivf_rebalance_balance_stats",
    # (b) driver-proven rows (buffer), prior priority order preserved
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
    "asof_signup_before_purchase",
    "exact_value_quantiles",
    "salted_user_event_counts",
    "doc_array_functions",
    "grouping_sets_revenue",
    "unpivot_order_totals",
    "customer_order_window_frames",
    "lineitem_math_functions",
    "null_semantics_orders",
    "customer_rfm_scores",
    "user_dynamic_sessions",
    "events_time_rollup",
    "deterministic_sample_docs",
    "stratified_sample_docs",
    "dedup_substring_spans",
    "source_mixture_plan",
    "ps_orders_priority_stats",
    "signup_purchase_conversion",
    "approx_distinct_parts",
    "customer_order_gaps",
    "event_props_stats",
    "trending_terms_by_source",
    "trending_event_type_hourly",
    "events_per_minute",
    "events_sliding_10m_5m",
    "running_event_total",
    "media_decoded_dimensions",
    "media_resize_thumbnails",
    "file_format_roundtrip_stats",
    "schema_evolution_merged_stats",
    "jsonl_corrupt_record_audit",
    "similarity_ann_recall",
    "stream_events_per_minute",
    "stream_events_per_minute_append",
    "stream_running_total",
    "stream_trending_event_type",
    "stream_session_windows",
    "stream_dedup_user_event_types",
    "stream_dedup_within_watermark",
    "stream_user_event_counts_stateful",
    "stream_hourly_approx_users",
    "stream_sliding_counts",
    "stream_stream_join_conversions",
    "stream_stream_left_join_conversions",
    "stream_static_segment_counts",
    "stream_minutely_rate_pt",
)


def _driver_green_rounds() -> "dict[str, int]":
    """Map each driver-proven query name to its NEWEST green round number.

    A row is green when every check it carries passed (rows/schema/hash true
    where present, err null). Failing rows do NOT count — a query whose last
    driver row failed sorts with the never-tested debt so the gate retries it.
    The round number is parsed from the ``CORRECTNESS_r{N}.json`` filename;
    unparsable filenames count as round 0 (stalest possible evidence).
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    newest: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        m = re.search(r"CORRECTNESS_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            checks = [
                row.get(k)
                for k in ("rows_match", "schema_match", "hash_match")
                if k in row
            ]
            if checks and all(v is True for v in checks) and row.get("err") is None:
                newest[name] = max(rnd, newest.get(name, 0))
    return newest


def _driver_green_names() -> frozenset[str]:
    """Names with at least one green row in any committed CORRECTNESS_r*.json."""
    return frozenset(_driver_green_rounds())


def gate_order(names: "set[str] | frozenset[str]") -> list[str]:
    """Order query names for the driver's ~50-slot correctness gate.

    Driver-unproven queries (no green row in any committed CORRECTNESS file)
    come first, so the gate always reaches new debt without a manual rotation
    commit. Proven queries follow ordered OLDEST evidence first (lowest
    newest-green round), so once debt hits zero the gate becomes a staleness
    re-verification rotation (VERDICT r9 ask #1). The static
    ``_GATE_PRIORITY`` tuple is only a tie-break within each freshness tier,
    and names absent from the tuple (just registered this round) sort after
    tuple-listed peers in their tier.
    """
    green = _driver_green_rounds()
    static_rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    fallback = len(_GATE_PRIORITY)
    reg_rank = {n: i for i, n in enumerate(QUERIES)}
    recheck = set(_RECHECK_FIRST)
    return sorted(
        names,
        key=lambda n: (
            # semantics-changed names re-enter the unproven tier: their
            # old green rows predate the current contract (_RECHECK_FIRST)
            -1 if n in recheck else green.get(n, -1),
            static_rank.get(n, fallback),
            reg_rank.get(n, 0),
        ),
    )


def load_all() -> dict[str, QuerySpec]:
    """Import every query-defining module so the registry is fully populated.

    Returns the registry reordered so driver-unproven queries come first
    (see ``gate_order``) — the round driver's correctness gate walks
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
    import spark_streaming_twitter_spark.multimodal.phash  # noqa: F401
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
    return {n: QUERIES[n] for n in gate_order(set(QUERIES))}
