"""Tweet ingest: the reference's Kafka->JSON->record path, Catalyst-native.

Reference pipeline (SURVEY.md §2.2):
- P1 cast-projection of raw Kafka binary key/value to strings
  (TwitterDatasetTrendingHashtag.java:74)
- P2/P3 Jackson POJO parse of the status JSON into ``Tweet(text, timestamp,
  lang)`` (Tweet.java:10-21); v1 swallows parse errors -> null record
  (TwitterDStreamTrendingHashtag.java:224-233), v2 would crash the task
- P4 the null records are never filtered — a latent NPE downstream

Ours: ``from_json`` in PERMISSIVE mode (the v1 tolerant semantics, now
Catalyst-visible so the Kafka scan prunes to ``value`` and the JSON parse
prunes to the 3-field schema) + an EXPLICIT null filter. The upstream
producer appends an epoch-millis ``timestamp`` field to the raw status
(Tweet.java:65, last key, consumed via the bean setter Tweet.java:38-41) —
parsed here with ``timestamp_millis``.

The known reference quirk is pinned by tests and kept: hashtags are
extracted from the top-level ``text`` ONLY, so a truncated retweet's
hashtags (living in ``extended_tweet.entities.hashtags``) are missed
(SURVEY.md §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.operators.trending import extract_hashtags
from spark_streaming_twitter_spark.registry import query

# The 3 fields the reference keeps (Tweet.java:10-21); everything else in
# the ~100-field status document is dropped (ignoreUnknown=true).
# ``timestamp`` arrives as an epoch-millis STRING from the producer.
TWEET_JSON_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("timestamp", StringType()),
        StructField("lang", StringType()),
    ]
)


def parse_tweets(kafka_shaped: DataFrame) -> DataFrame:
    """(key,value) Kafka-shaped rows -> (text, ts, lang) tweet records.

    PERMISSIVE parse: malformed JSON yields null fields, then the explicit
    ``text IS NOT NULL`` filter drops them (the filter the reference forgot,
    SURVEY.md P4). All expression-level: prunable, codegen'd, no Python.
    """
    parsed = kafka_shaped.selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
    ).select(
        F.from_json(
            F.col("value"), TWEET_JSON_SCHEMA, {"mode": "PERMISSIVE"}
        ).alias("t")
    )
    return parsed.select(
        F.col("t.text").alias("text"),
        F.timestamp_millis(F.col("t.timestamp").cast("bigint")).alias("ts"),
        F.col("t.lang").alias("lang"),
    ).where(F.col("text").isNotNull())


def hashtag_counts(tweets: DataFrame) -> DataFrame:
    """Per-hashtag totals with first-seen event time — Q1's batch core."""
    tags = extract_hashtags(tweets, "text")
    return tags.groupBy("hashtag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.unix_timestamp("ts")).alias("first_seen_epoch"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "tweet_hashtag_pipeline",
    oracle="""
SELECT '#' || source AS hashtag,
       count(*) AS n,
       min(doc_id) AS first_seen_epoch,
       count(DISTINCT lang) AS n_langs
FROM documents
WHERE doc_id % 97 <> 0
GROUP BY source
""",
    doc="End-to-end ingest parity: documents are wrapped into Kafka-shaped "
    "(key,value) rows with a producer-style JSON payload ('#'||source "
    "prepended to text, epoch-millis timestamp, lang), 1 row in 97 is "
    "corrupted on purpose; the pipeline must cast (P1), parse PERMISSIVE "
    "(P2/P3), drop malformed (P4), extract hashtags via regex explode "
    "(F1/F2), and aggregate. The oracle computes the expected answer "
    "directly — the JSON round-trip must be lossless.",
    bench=True,
)
def tweet_hashtag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the fixture parquet is one file -> one scan task; repartition
    # so the parse+extract stages run wide, like a many-partition Kafka
    # topic. The exchange also splits to_json and from_json into separate
    # codegen stages, keeping each generated method small enough for C2.
    from spark_streaming_twitter_spark.catalog import widen

    docs = widen(table(spark, sf_dir, "documents"), spark)
    payload = F.to_json(
        F.struct(
            # '#' is stripped from the document body so the only hashtag in
            # the payload is the '#'||source we prepend — the invariant the
            # oracle depends on, pinned here rather than assumed.
            F.concat(
                F.lit("#"),
                F.col("source"),
                F.lit(" "),
                F.regexp_replace(F.col("text"), "#", ""),
            ).alias("text"),
            (F.col("doc_id") * 1000).cast("string").alias("timestamp"),
            F.col("lang").alias("lang"),
        )
    )
    kafka_shaped = docs.select(
        F.col("doc_id").cast("string").cast("binary").alias("key"),
        F.when(F.col("doc_id") % 97 == 0, F.lit('{"broken'))
        .otherwise(payload)
        .cast("binary")
        .alias("value"),
    )
    return hashtag_counts(parse_tweets(kafka_shaped))


@query(
    "file_format_roundtrip_stats",
    oracle="""
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
    doc="File-format coverage: the documents table is written to CSV "
    "(header, explicit quoting) and JSON Lines in a spool dir, read back "
    "through all three readers with explicit schemas, unioned, and "
    "aggregated — the oracle (straight from parquet) proves every "
    "round-trip lossless. Rows travel via CSV, JSONL, or ORC by a "
    "disjoint doc_id%3 split, so no reader can mask another.",
)
def file_format_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import spool_fixture

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )

    def write_all(base) -> None:
        third = F.col("doc_id") % 3
        # escape='"' (RFC-4180 doubled quotes) + multiLine on read: texts
        # containing quotes or newlines survive the CSV round-trip.
        (
            docs.where(third == 0)
            .coalesce(2)
            .write.mode("overwrite")
            .option("header", "true")
            .option("quoteAll", "true")
            .option("escape", '"')
            .csv(str(base / "csv"))
        )
        (
            docs.where(third == 1)
            .coalesce(2)
            .write.mode("overwrite")
            .json(str(base / "json"))
        )
        (
            docs.where(third == 2)
            .coalesce(2)
            .write.mode("overwrite")
            .orc(str(base / "orc"))
        )

    base = spool_fixture("fmt", sf_dir, "v3-orc", write_all)
    schema = "doc_id long, text string, lang string, n_chars long"
    from_csv = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(str(base / "csv"))
    )
    from_json_files = spark.read.schema(schema).json(str(base / "json"))
    from_orc = spark.read.schema(schema).orc(str(base / "orc"))
    together = from_csv.unionByName(from_json_files).unionByName(from_orc)
    return together.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "schema_evolution_merged_stats",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_lang,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
         AS chars_with_lang
FROM documents
GROUP BY source
""",
    doc="Schema evolution on read (the capability whose absence in a "
    "pipeline turns a fixture/producer schema change into silent "
    "corruption — see the streaming ts-drift guard in "
    "harness.stream_events): generation-1 parquet files carry "
    "(doc_id, source), generation 2 adds (lang, n_chars); "
    "mergeSchema=true reads both generations as ONE table where the "
    "gen-1 rows surface NULL for the added columns. The oracle recomputes "
    "from the source table: rows with lang == odd doc_ids (the gen-2 "
    "half), so the NULL backfill is value-checked, not just schema-"
    "checked — including the all-NULL group sum staying NULL (the oracle "
    "omits ELSE so SQL NULL-sum semantics match Spark's). At 100 TB this "
    "is the additive-column evolution path "
    "(parquet footer merge); non-additive changes belong to a rewrite "
    "job, not the reader.",
)
def schema_evolution_merged_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import spool_fixture

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )

    def write_generations(base) -> None:
        gen2 = F.col("doc_id") % 2 == 1
        (
            docs.where(~gen2)
            .select("doc_id", "source")
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(str(base / "docs"))
        )
        (
            docs.where(gen2)
            .coalesce(2)
            .write.mode("append")
            .parquet(str(base / "docs"))
        )

    base = spool_fixture("schema_evo", sf_dir, "v1", write_generations)
    merged = spark.read.option("mergeSchema", "true").parquet(str(base / "docs"))
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("lang").alias("n_with_lang"),
        F.sum("n_chars").alias("chars_with_lang"),
    )


@query(
    "jsonl_corrupt_record_audit",
    oracle="""
SELECT CASE WHEN doc_id % 50 = 0 THEN NULL ELSE lang END AS lang,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt
FROM documents
GROUP BY 1
""",
    doc="READER-level corrupt-record quarantine (the ingest-audit stage of "
    "a production pipeline, distinct from the column-level from_json "
    "PERMISSIVE path in tweet_hashtag_pipeline): a JSONL spool with 1 in "
    "50 lines truncated mid-object is read with an explicit "
    "columnNameOfCorruptRecord; malformed lines surface as rows with the "
    "raw line preserved in the corrupt column and every data field NULL — "
    "nothing dropped, nothing crashed. The audit aggregates rows and "
    "corrupt counts per lang; the oracle recomputes both from the "
    "corruption rule. At 100 TB this is the quarantine-and-continue "
    "contract: bad producer batches become countable, inspectable rows.",
)
def jsonl_corrupt_record_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import spool_fixture

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")

    def write_spool(base) -> None:
        corrupt = F.col("doc_id") % 50 == 0
        lines = docs.select(
            F.when(corrupt, F.lit('{"doc_id": broken')).otherwise(
                F.to_json(F.struct("doc_id", "lang"))
            ).alias("value")
        )
        lines.coalesce(2).write.mode("overwrite").text(str(base / "jsonl"))

    base = spool_fixture("corrupt_jsonl", sf_dir, "v1", write_spool)
    raw = (
        spark.read.schema("doc_id long, lang string, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(base / "jsonl"))
    )
    return raw.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_bad").alias("n_corrupt"),
    )


@query(
    "xml_format_roundtrip_stats",
    oracle="""
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len
FROM documents
GROUP BY lang
""",
    doc="Spark 4 NATIVE XML source (the spark-xml package folded into "
    "core): the documents table round-trips through element-per-row XML "
    "(rootTag/rowTag, writer entity-escapes markup in text) and is read "
    "back with an explicit schema — completing the format matrix next to "
    "file_format_roundtrip_stats' CSV/JSONL/ORC legs. total_text_len "
    "(sum of actual string lengths after the round-trip) is the "
    "lossless-text proof: any entity mis-escape or whitespace trim "
    "changes it. Scale: the XML reader splits by row tag per file like "
    "any text source — schema is pinned (no inference scan).",
)
def xml_format_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import spool_fixture

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )

    def write_all(base) -> None:
        (
            docs.coalesce(2)
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "documents")
            .option("rowTag", "document")
            .save(str(base / "xml"))
        )

    base = spool_fixture("xmlfmt", sf_dir, "v1", write_all)
    back = (
        spark.read.schema("doc_id long, text string, lang string, n_chars long")
        .format("xml")
        .option("rowTag", "document")
        .load(str(base / "xml"))
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text")).alias("total_text_len"),
    )
