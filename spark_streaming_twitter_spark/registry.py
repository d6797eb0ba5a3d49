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


def load_all() -> dict[str, QuerySpec]:
    """Import every query-defining module so the registry is fully populated."""
    import spark_streaming_twitter_spark.operators.advanced  # noqa: F401
    import spark_streaming_twitter_spark.operators.analytics  # noqa: F401
    import spark_streaming_twitter_spark.operators.relational  # noqa: F401
    import spark_streaming_twitter_spark.operators.trending  # noqa: F401
    import spark_streaming_twitter_spark.operators.windows  # noqa: F401
    import spark_streaming_twitter_spark.dedup.dedup  # noqa: F401
    import spark_streaming_twitter_spark.dedup.queries  # noqa: F401
    import spark_streaming_twitter_spark.functions.pandas_udfs  # noqa: F401
    import spark_streaming_twitter_spark.functions.sampling  # noqa: F401
    import spark_streaming_twitter_spark.multimodal.columns  # noqa: F401
    import spark_streaming_twitter_spark.sources.tweets  # noqa: F401
    import spark_streaming_twitter_spark.similarity.search  # noqa: F401
    import spark_streaming_twitter_spark.similarity.queries  # noqa: F401
    import spark_streaming_twitter_spark.streaming.queries  # noqa: F401
    import spark_streaming_twitter_spark.text.analysis  # noqa: F401
    import spark_streaming_twitter_spark.text.queries  # noqa: F401

    return QUERIES
