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
# rows per round, so ordering IS coverage policy. Round-5 rotation
# (VERDICT r4 "Next round" #3): no-green-row first, then oldest-driver-row
# first — rounds 3-4 burned both their 50-slot budgets on the identical set,
# leaving 59 queries whose newest rows predate the round-4 fixture
# regeneration. Queries proven in r3/r4 drop to the back.
_GATE_PRIORITY: tuple[str, ...] = (
    # Driver-red in r4 (the stream_events ts bug, fixed this round).
    "stream_static_segment_counts",
    # Never green in any driver round: red since r1 (fixed since, but its
    # only row predates the fix) + the three rows-only queries now upgraded
    # to bounded-check oracles (this round).
    "lineitem_math_functions",
    "approx_distinct_parts",
    "approx_value_percentiles",
    "similarity_topk_numpy",
    # New round-5 queries (no driver row by construction) + the format
    # round-trip, changed this round (ORC leg added to the CSV/JSONL split).
    "media_decoded_dimensions",
    "stream_minutely_rate_pt",
    "stream_stream_left_join_conversions",
    "file_format_roundtrip_stats",
    "dedup_substring_spans",
    "similarity_ann_recall",
    "user_dynamic_sessions",
    "events_time_rollup",
    "cogrouped_purchase_latency",
    "schema_evolution_merged_stats",
    "source_mixture_plan",
    "stream_session_timeout_stateful",
    "stream_hourly_approx_users",
    "ps_orders_priority_stats",
    "media_resize_thumbnails",
    "jsonl_corrupt_record_audit",
    # Newest row r2, and all consume stream_events — the source that just
    # changed semantics; every one needs re-proving against the new fixture.
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
    # Newest row r1 — events/time-dependent first (most exposed to the
    # fixture regeneration), then the rest in registration order.
    "events_per_minute",
    "events_sliding_10m_5m",
    "running_event_total",
    "trending_terms_by_source",
    "trending_event_type_hourly",
    "salted_user_event_counts",
    "event_props_stats",
    "asof_signup_before_purchase",
    "signup_purchase_conversion",
    "customer_order_gaps",
    "exact_value_quantiles",
    "doc_array_functions",
    "grouping_sets_revenue",
    "unpivot_order_totals",
    "customer_order_window_frames",
    "null_semantics_orders",
    "customer_rfm_scores",
    "deterministic_sample_docs",
    "stratified_sample_docs",
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
    # a duplicate name would silently shrink the ~50-slot gate budget
    assert len(set(_GATE_PRIORITY)) == len(_GATE_PRIORITY), (
        "_GATE_PRIORITY contains duplicates"
    )
    first = {n: QUERIES[n] for n in _GATE_PRIORITY}
    rest = {n: s for n, s in QUERIES.items() if n not in first}
    return {**first, **rest}
