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


# Queries the round-1 driver gate never reached (CORRECTNESS_r01.json stops
# at the first 50 registration slots). The gate walks the registry in order,
# so these register FIRST until every one has a driver correctness entry;
# queries with round-1 driver rows follow.
_GATE_PRIORITY: tuple[str, ...] = (
    # Round-3 slots 1-2: the only two queries (of 102) with no driver
    # CORRECTNESS row after rounds 1-2 — the 50-entry/round gate ran out
    # before reaching them both times (VERDICT r2 "Next round" #1).
    "stream_static_segment_counts",
    "stream_tweet_trending_e2e",
    # New round-3 queries (no driver row yet by construction).
    "stream_events_availablenow",
    "dedup_group_ids_star",
    "pack_training_sequences",
    "doc_chunk_windows",
    "vocab_oov_rate",
    "stratified_split_exact",
    "source_temperature_weights",
    "weekly_cohort_retention",
    "dedup_ngram_jaccard_pairs",
    "user_event_sessions",
    "latest_event_per_user_type",
    "orders_column_profile",
    "keyword_search_topk",
    "frequent_terms_heavy_hitters",
    "doc_repetition_scores",
    "doc_pii_redaction",
    "dedup_decontaminate",
    "corpus_curation_pipeline_full",
    "dedup_graph_pagerank",
    "embedding_kmeans_clusters",
    "event_transition_matrix",
    "signup_view_purchase_funnel",
    "part_price_distribution",
    "events_moving_avg_1h",
    "user_value_intervals_scd2",
    "events_pit_enrichment",
    "event_props_variant",
    "pipe_sql_returnflag_revenue",
    "udtf_token_positions",
    "dedup_edit_distance_verify",
    "dedup_drop_list",
    "dedup_minhash_lsh_pairs_capped",
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine_pairs",
    "dedup_group_ids",
    "corpus_curation_pipeline",
    "pandas_udf_token_counts",
    "applyinpandas_source_ranks",
    "mapinarrow_byte_histograms",
    "media_byte_histograms",
    "media_meta_stats",
    "media_frame_samples",
    "tweet_hashtag_pipeline",
    "file_format_roundtrip_stats",
    "similarity_topk_cosine",
    "similarity_ann_lsh_topk",
    "similarity_ivf_topk",
    "similarity_topk_numpy",
    "stream_events_per_minute",
    "stream_events_per_minute_append",
    "stream_running_total",
    "stream_trending_event_type",
    "stream_session_windows",
    "stream_dedup_user_event_types",
    "stream_dedup_within_watermark",
    "stream_user_event_counts_stateful",
    "stream_sliding_counts",
    "stream_stream_join_conversions",
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
    import spark_streaming_twitter_spark.operators.modern  # noqa: F401
    import spark_streaming_twitter_spark.operators.relational  # noqa: F401
    import spark_streaming_twitter_spark.operators.trending  # noqa: F401
    import spark_streaming_twitter_spark.operators.windows  # noqa: F401
    import spark_streaming_twitter_spark.dedup.dedup  # noqa: F401
    import spark_streaming_twitter_spark.functions.pandas_udfs  # noqa: F401
    import spark_streaming_twitter_spark.functions.sampling  # noqa: F401
    import spark_streaming_twitter_spark.multimodal.columns  # noqa: F401
    import spark_streaming_twitter_spark.sources.tweets  # noqa: F401
    import spark_streaming_twitter_spark.similarity.kmeans  # noqa: F401
    import spark_streaming_twitter_spark.similarity.search  # noqa: F401
    import spark_streaming_twitter_spark.streaming.queries  # noqa: F401
    import spark_streaming_twitter_spark.text.analysis  # noqa: F401
    import spark_streaming_twitter_spark.text.corpus  # noqa: F401

    missing = set(_GATE_PRIORITY) - QUERIES.keys()
    assert not missing, (
        f"_GATE_PRIORITY names absent from the registry (rename/typo?): "
        f"{sorted(missing)}"
    )
    first = {n: QUERIES[n] for n in _GATE_PRIORITY}
    rest = {n: s for n, s in QUERIES.items() if n not in first}
    return {**first, **rest}
