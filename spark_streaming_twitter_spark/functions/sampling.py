"""Deterministic sampling & dataset splitting (training-data pipeline ops).

``df.sample()`` draws from a per-partition RNG — results change with
partitioning, retries, and engines, which is unacceptable for reproducible
100 TB corpus construction. Everything here samples by HASH of a stable key:
the decision for a row is a pure function of the row, so any engine, any
cluster, any retry produces the same subset (and the DuckDB oracle proves
it). The same mechanism assigns train/val/test splits.

Hash-mod sampling is also the only kind that composes: a 1% sample of a 10%
sample is the rows whose hash falls in both ranges — no coordination needed
between jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.functions.hashing import (
    portable_hash,
    portable_hash_sql,
)
from spark_streaming_twitter_spark.registry import query

BUCKETS = 10_000  # sampling resolution: 0.01%


def sample_bucket(key: Column, salt: str = "sample") -> Column:
    """Stable bucket in [0, BUCKETS) for a key column (salted)."""
    return portable_hash(F.concat(F.lit(salt + ":"), key.cast("string"))) % BUCKETS


def sample_bucket_sql(key_expr: str, salt: str = "sample") -> str:
    salted = f"'{salt}:' || CAST({key_expr} AS VARCHAR)"
    return f"{portable_hash_sql(salted)} % {BUCKETS}"


@query(
    "deterministic_sample_docs",
    oracle=f"""
SELECT doc_id, source, lang
FROM documents
WHERE {sample_bucket_sql("doc_id")} < {BUCKETS // 10}
""",
    doc="Reproducible 10%% sample: keep rows whose salted key-hash bucket "
    "falls below the rate cutoff. A pure row-local predicate — pushes into "
    "the scan, no shuffle, identical subset on any engine/partitioning/"
    "retry (df.sample() guarantees none of these).",
)
def deterministic_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return docs.where(sample_bucket(F.col("doc_id")) < BUCKETS // 10)


@query(
    "stratified_sample_docs",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {sample_bucket_sql("doc_id")} <
      CASE lang WHEN 'en' THEN {BUCKETS // 20} ELSE {BUCKETS // 2} END
""",
    doc="Stratified sampling: per-stratum rates (downsample the dominant "
    "'en' to 5%%, keep 50%% of the rest — the classic rebalancing move for "
    "a multilingual corpus). Still a row-local predicate; the rate lookup "
    "is a CASE, or a broadcast-joined rate table for many strata.",
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    rate = F.when(F.col("lang") == "en", F.lit(BUCKETS // 20)).otherwise(
        F.lit(BUCKETS // 2)
    )
    return docs.where(sample_bucket(F.col("doc_id")) < rate)


@query(
    "train_val_test_split",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id,
         CASE WHEN {sample_bucket_sql("doc_id", "split")} < {BUCKETS * 8 // 10}
                THEN 'train'
              WHEN {sample_bucket_sql("doc_id", "split")} < {BUCKETS * 9 // 10}
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM assigned GROUP BY split
""",
    doc="Train/val/test assignment (80/10/10) by salted key-hash range — "
    "stable across runs and engines, leak-free (a doc can never change "
    "split), and needs no global shuffle or coordination. The salt "
    "namespace ('split:') keeps it independent of any sampling decision "
    "on the same key.",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    b = sample_bucket(F.col("doc_id"), salt="split")
    split = (
        F.when(b < BUCKETS * 8 // 10, "train")
        .when(b < BUCKETS * 9 // 10, "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "contrastive_negative_samples",
    oracle="""
WITH pos AS (
  SELECT user_id, event_id AS pos_id, ts AS pos_ts
  FROM events WHERE event_type = 'purchase'
),
neg AS (
  SELECT user_id, event_id AS neg_id, ts AS neg_ts
  FROM events WHERE event_type = 'view'
),
paired AS (
  SELECT p.pos_id, n.neg_id,
         row_number() OVER (
           PARTITION BY p.pos_id
           ORDER BY CAST(('0x' || substr(md5(CAST(p.pos_id AS VARCHAR)
                                         || ':' || CAST(n.neg_id AS VARCHAR)),
                          1, 15)) AS BIGINT) ASC,
                    n.neg_id ASC) AS neg_rank
  FROM pos p JOIN neg n
    ON n.user_id = p.user_id AND n.neg_ts < p.pos_ts
)
SELECT pos_id, neg_id, CAST(neg_rank AS BIGINT) AS neg_rank
FROM paired WHERE neg_rank <= 3
""",
    doc="Deterministic negative sampling for contrastive training: every "
    "purchase (positive) draws 3 of the same user's earlier views "
    "(in-session hard negatives — same user, same context, different "
    "outcome) by PAIR-SEEDED hash rank: ordering on "
    "portable_hash(pos_id:neg_id) makes each positive draw an "
    "independent pseudo-random subset, yet the whole sample is exactly "
    "reproducible across engines and reruns — the property negative "
    "sampling needs for resumable training-data builds (same epoch, "
    "same negatives). Plan: per-user equi-join with a time predicate "
    "(bounded per-user fan-out), one rank window per positive; at "
    "100 TB cap the per-user candidate pool (hash-rank top-M views "
    "first) to bound the pairing quadratic.",
)
def contrastive_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.functions.hashing import portable_hash

    ev = table(spark, sf_dir, "events")
    pos = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pos_id"), F.col("ts").alias("pos_ts")
    )
    neg = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("n_user"),
        F.col("event_id").alias("neg_id"),
        F.col("ts").alias("neg_ts"),
    )
    pair_hash = portable_hash(
        F.concat(
            F.col("pos_id").cast("string"),
            F.lit(":"),
            F.col("neg_id").cast("string"),
        )
    )
    w = Window.partitionBy("pos_id").orderBy(
        pair_hash.asc(), F.col("neg_id").asc()
    )
    return (
        pos.join(
            neg,
            (F.col("n_user") == F.col("user_id"))
            & (F.col("neg_ts") < F.col("pos_ts")),
        )
        .withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("neg_rank") <= 3)
        .select("pos_id", "neg_id", "neg_rank")
    )
