"""Time-window counting — reference Q2/Q3 in batch-expressible form.

Q2 "TweetPerSecondCountSpark" = tumbling count
(TwitterDatasetTrendingHashtag.java:88-90: ``groupBy(window(ts,"1 seconds"))
.count()``). Q3 "TotalTweetCountSpark" = running total; the reference funnels
every row to a single constant key through mapGroupsWithState
(TwitterDatasetTrendingHashtag.java:97-107) — one task owns the world. Our
shape: aggregate per time bucket FIRST (sharded, partial+final hash agg),
then a cumulative sum over the tiny bucket table; the single-partition window
touches only #buckets rows, never the raw input.

The streaming forms live in ``spark_streaming_twitter_spark.streaming``;
these batch analogues are the oracle-checkable twins over ``events``.

Oracle parity conventions: window boundaries emitted as epoch seconds
(BIGINT) on both sides; counts are BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.registry import query


def tumbling_counts(df: DataFrame, ts_col: str, duration: str) -> DataFrame:
    """Tumbling-window count: ``groupBy(window(ts, duration)).count()``."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("bucket_ts"), "n")
    )


def sliding_counts(df: DataFrame, ts_col: str, duration: str, slide: str) -> DataFrame:
    """Sliding-window count (reference W1/W2 shape).

    Spark's ``window(ts, d, s)`` replicates each row into d/s overlapping
    windows via a Generate — the same expansion a DStream
    ``reduceByKeyAndWindow`` does (TwitterDStreamTrendingHashtag.java:82-83),
    but computed incrementally per window by the hash aggregate.
    """
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start"), "n")
    )


@query(
    "events_per_minute",
    oracle="""
SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_ts,
       count(*) AS n
FROM events GROUP BY 1
""",
    doc="Reference Q2 (tweets-per-second throughput gauge) as tumbling "
    "1-minute counts over events.ts (TwitterDatasetTrendingHashtag.java:88-90).",
    bench=True,
)
def events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("ts")
    return tumbling_counts(ev, "ts", "1 minute")


@query(
    "events_sliding_10m_5m",
    oracle="""
WITH ev AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
expanded AS (
  SELECT unnest(generate_series(e - (e % 300) - 300, e - (e % 300), 300)) AS ws
  FROM ev
)
SELECT ws AS window_start, count(*) AS n
FROM expanded GROUP BY 1
""",
    doc="Reference W1/W2 sliding window (window=10 min, slide=5 min) over "
    "events.ts; each event lands in exactly window/slide = 2 buckets.",
)
def events_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("ts")
    return sliding_counts(ev, "ts", "10 minutes", "5 minutes")


@query(
    "running_event_total",
    oracle="""
WITH buckets AS (
  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_ts,
         count(*) AS bucket_count
  FROM events GROUP BY 1
)
SELECT bucket_ts, bucket_count,
       CAST(sum(bucket_count) OVER (ORDER BY bucket_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_count
FROM buckets
""",
    doc="Reference Q3 (TotalTweetCountSpark running total) without the "
    "constant-key funnel (TwitterDatasetTrendingHashtag.java:99): per-minute "
    "sharded counts, then a cumulative sum over #buckets rows only.",
    bench=True,
)
def running_event_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("ts")
    buckets = (
        ev.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("bucket_count"))
        .select(F.unix_timestamp("w.start").alias("bucket_ts"), "bucket_count")
    )
    w = Window.orderBy("bucket_ts").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.withColumn("running_count", F.sum("bucket_count").over(w))


@query(
    "events_moving_avg_1h",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
)
SELECT user_id, event_id, ts_s,
       CAST(CAST(sum(v) OVER w AS DECIMAL(18,6)) AS DOUBLE)
         / count(*) OVER w AS moving_avg_1h,
       count(*) OVER w AS n_in_window
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
    doc="Per-user 1-hour trailing moving average over event values — the "
    "time-RANGE window frame (RANGE BETWEEN 3600 PRECEDING on epoch "
    "seconds), the one frame type the ROWS-frame queries don't cover. "
    "Partitioned by user_id: one shuffle, per-user local sort, state is "
    "the in-frame buffer. Sum runs in DECIMAL(18,6) (order-independent "
    "exact) and divides by the frame count once — bitwise-stable on any "
    "topology. Same-timestamp events share a frame (RANGE semantics), so "
    "the result is tie-insensitive by construction.",
)
def events_moving_avg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_s",
        (
            F.sum("v").over(w).cast("decimal(18,6)").cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# ---------------------------------------------------------------------------
# EWMA (alpha = 1/4), exact-integer truncated form. The recurrence
# y_n = a*x_n + (1-a)*y_{n-1} expands to a * sum_k (1-a)^k x_{n-k}; with
# a = 1/4 and the tail truncated at K=16 lags (weight (3/4)^16 < 1.1% —
# the standard "effective window" cutoff), scaling by 4^15 makes every
# weight an integer: w_k = 3^k * 4^(15-k). The smoothed series is then a
# BIGINT dot product of the last 16 observed buckets — no float
# accumulation order to disagree on, so the DuckDB twin is hash-exact.
# ---------------------------------------------------------------------------
_EWMA_K = 16
_EWMA_WEIGHTS = tuple(3**k * 4 ** (15 - k) for k in range(_EWMA_K))


@query(
    "events_ewma_by_type",
    oracle=f"""
WITH buckets AS (
  SELECT event_type,
         CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_ts,
         count(*) AS bucket_count
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket_ts, CAST(bucket_count AS BIGINT) AS bucket_count,
       CAST({" + ".join(
           f"lag(bucket_count, {k}, 0) OVER (PARTITION BY event_type "
           f"ORDER BY bucket_ts) * {w}"
           for k, w in enumerate(_EWMA_WEIGHTS)
       )} AS BIGINT) AS ewma_scaled
FROM buckets
""",
    doc="Exponentially-weighted moving average of per-minute event counts "
    "per type (alpha=1/4, 16-lag truncation) in EXACT BIGINT: the "
    "geometric weights are scaled to integers (see _EWMA_WEIGHTS note) "
    "and the smoother is a fixed 16-term dot product over lag() columns "
    "— one window sort per type, no recurrence, no float. Defined over "
    "the observed-bucket ROW sequence (missing minutes contribute "
    "nothing; compose with events_gapfill_locf for a dense grid). Plan: "
    "corpus-sized groupBy to minutely buckets, then the window runs over "
    "#types x #minutes rows only — at 100 TB the smoother's input is "
    "~10^6 rows regardless of event volume, the pre-aggregate-then- "
    "analyze shape that keeps trend detection off the raw stream.",
)
def events_ewma_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    buckets = (
        ev.groupBy(
            "event_type", F.window("ts", "1 minute").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("bucket_count"))
        .select(
            "event_type",
            F.unix_timestamp("w.start").alias("bucket_ts"),
            "bucket_count",
        )
    )
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    ewma = None
    for k, wt in enumerate(_EWMA_WEIGHTS):
        term = F.lag("bucket_count", k, 0).over(w).cast("bigint") * F.lit(wt)
        ewma = term if ewma is None else ewma + term
    return buckets.select(
        "event_type",
        "bucket_ts",
        F.col("bucket_count").cast("bigint").alias("bucket_count"),
        ewma.cast("bigint").alias("ewma_scaled"),
    )
