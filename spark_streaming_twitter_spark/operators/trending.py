"""Trending-term argmax — the reference's flagship query (Q1), Spark-first.

Reference semantics: extract tags from text, count per (window, tag), keep
the tag with the max count per window. The reference does this with a
map-buffer UDAF (``TrendingHashTagAggregator``,
TwitterDatasetTrendingHashtag.java:140-210) whose per-window
``Map<String,Integer>`` state is unbounded and non-mergeable — the exact
anti-pattern that dies at 100 TB.

Spark-first decomposition (SURVEY.md §2.4 A3):
  stage 1: ``groupBy(bucket, term).count()``  — partial+final hash agg,
           shuffle partitioned by (bucket, term); no hot keys.
  stage 2: per-bucket argmax via ``max_by(struct)`` — a second, much smaller
           agg keyed by bucket only.
Both stages are built-in HashAggregates with map-side partial aggregation,
so the plan scales linearly with input and the shuffle carries only
(bucket, term, count) triples.

Tie-break: the reference's argmax is nondeterministic HashMap-iteration
order (TwitterDatasetTrendingHashtag.java:187-196); our contract is
deterministic min-term-on-tie, encoded as ``max_by(term, (count, rev_term))``
equivalently expressed with a struct ordering on (count DESC, term ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.registry import query


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode whitespace-separated terms; drops empty tokens.

    Generalizes the reference's hashtag flatMap (F1/F2,
    TwitterDStreamTrendingHashtag.java:60-78) to arbitrary term streams —
    a pure Project+Generate, fully codegen'd, no Python.
    """
    return df.withColumn("term", F.explode(F.split(F.col(text_col), " "))).where(
        F.col("term") != ""
    )


def extract_hashtags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Hashtag explode: regex ``#\\w+`` over text, one row per match.

    Mirrors reference F1/F2 (Pattern.compile("#\\\\w+"),
    TwitterDStreamTrendingHashtag.java:60-78) as a native Generate over
    ``regexp_extract_all`` — Catalyst-visible, prunable, codegen'd.
    """
    # instr prefilter: rows with no '#' can't match, and explode drops
    # empty-array rows anyway — so skipping the regex for them is
    # semantics-preserving and saves a full regex scan per hashtag-free
    # document (most of a real corpus).
    return df.where(F.instr(F.col(text_col), "#") > 0).withColumn(
        "hashtag",
        F.explode(F.expr(f"regexp_extract_all({text_col}, '#\\\\w+', 0)")),
    )


def trending(df: DataFrame, bucket_cols: list[str], term_col: str = "term") -> DataFrame:
    """Two-stage argmax: top term per bucket with deterministic tie-break.

    Stage 1 shuffles on (bucket, term) — high cardinality, no skew funnel.
    Stage 2 shuffles only distinct (bucket, term) counts on bucket.
    """
    counts = df.groupBy(*bucket_cols, term_col).agg(F.count(F.lit(1)).alias("term_count"))
    w = Window.partitionBy(*bucket_cols).orderBy(
        F.col("term_count").desc(), F.col(term_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed(term_col, "top_term")
    )


_TRENDING_TERMS_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (
  SELECT source, term, count(*) AS term_count
  FROM tok WHERE term <> '' GROUP BY source, term
),
ranked AS (
  SELECT source, term, term_count,
         row_number() OVER (PARTITION BY source
                            ORDER BY term_count DESC, term ASC) AS rn
  FROM counts
)
SELECT source, term AS top_term, term_count FROM ranked WHERE rn = 1
"""


@query(
    "trending_terms_by_source",
    oracle=_TRENDING_TERMS_ORACLE,
    doc="Flagship: reference Q1 (trending hashtag) as batch trending-terms "
    "per document source; two-stage argmax replaces the map-buffer UDAF "
    "(TwitterDatasetTrendingHashtag.java:140-210).",
    bench=True,
)
def trending_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "text")
    return trending(tokenize(docs), ["source"]).select(
        "source", "top_term", "term_count"
    )


_TRENDING_EVENT_ORACLE = """
WITH counts AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_ts,
         event_type, count(*) AS term_count
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT bucket_ts, event_type, term_count,
         row_number() OVER (PARTITION BY bucket_ts
                            ORDER BY term_count DESC, event_type ASC) AS rn
  FROM counts
)
SELECT bucket_ts, event_type AS top_term, term_count FROM ranked WHERE rn = 1
"""


@query(
    "trending_event_type_hourly",
    oracle=_TRENDING_EVENT_ORACLE,
    doc="Reference Q1 over an event-time stream: hourly tumbling bucket, "
    "argmax event_type per bucket (window(ts) + two-stage argmax).",
    bench=True,
)
def trending_event_type_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("ts", "event_type")
    bucketed = ev.withColumn(
        "bucket_ts", F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
    )
    return trending(bucketed, ["bucket_ts"], term_col="event_type").select(
        "bucket_ts", "top_term", "term_count"
    )
