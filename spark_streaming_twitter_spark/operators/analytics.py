"""Composed analytics: cohort retention and RFM scoring.

Product-analytics shapes a user of the reference's pipeline would build
next — each a pure composition of already-covered primitives (window aggs,
self-joins on pre-aggregated tables, broadcast dims), included both for
API-surface breadth and as worked examples of the composition rules in
SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.functions.numeric import dsum, dsum_sql
from spark_streaming_twitter_spark.registry import query


@query(
    "weekly_cohort_retention",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_ts
  FROM events
),
cohorts AS (
  SELECT user_id, min(week_ts) AS cohort_week FROM activity GROUP BY 1
)
SELECT c.cohort_week,
       CAST((a.week_ts - c.cohort_week) // 604800 AS BIGINT) AS week_offset,
       count(*) AS n_active_users
FROM activity a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
""",
    doc="Weekly cohort retention: users bucketed by first-active week, "
    "counted in each later week. Two aggs + one join, ALL on the "
    "pre-deduplicated (user, week) activity table — the raw event stream "
    "is touched exactly once. The cohort map joins broadcast (one row per "
    "user).",
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    activity = ev.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("week_ts"),
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week_ts").alias("cohort_week"))
    return (
        activity.join(F.broadcast(cohorts), "user_id")
        .groupBy(
            "cohort_week",
            ((F.col("week_ts") - F.col("cohort_week")) / 604800)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "customer_rfm_scores",
    oracle=f"""
WITH maxd AS (SELECT max(o_orderdate) AS d FROM orders),
rfm AS (
  SELECT o_custkey,
         CAST((SELECT epoch(d) FROM maxd) - epoch(max(o_orderdate)) AS BIGINT)
           // 86400 AS recency_days,
         count(*) AS frequency,
         {dsum_sql('o_totalprice')} AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary,
       ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
       ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
       ntile(5) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score
FROM rfm
""",
    doc="RFM scoring: recency/frequency/monetary per customer, quintile "
    "scores via ntile. The unpartitioned ntile windows run over the "
    "PRE-AGGREGATED customer table (#customers rows), never the raw orders "
    "— the one legitimate use of a single-partition window (SCALE.md rule "
    "2). At larger customer counts swap ntile for approx_percentile "
    "cutoffs joined broadcast.",
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    max_d = orders.agg(F.max("o_orderdate").alias("d"))
    rfm = (
        orders.crossJoin(F.broadcast(max_d))
        .groupBy("o_custkey")
        .agg(
            (
                (F.unix_timestamp(F.first("d")) - F.unix_timestamp(F.max("o_orderdate")))
                / 86400
            )
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice").alias("monetary"),
        )
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    w_m = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey").asc())
    return rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
