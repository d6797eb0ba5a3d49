"""Golden-fixture tests for the tweet ingest path.

The fixture payload reproduces the STRUCTURE of the producer document the
reference embeds as its only executable check (Tweet.java:63-66): a truncated
retweet whose hashtag lives in ``extended_tweet.entities.hashtags`` (not in
the top-level ``text``), ~100 unknown fields elided, and the producer's
appended epoch-millis ``timestamp`` string as the last key. The pinned
behaviors:

1. unknown JSON fields are ignored (Jackson ignoreUnknown=true parity)
2. ``timestamp`` epoch-millis string -> event-time TIMESTAMP
3. hashtags come from ``text`` ONLY — the truncated retweet's
   ``#boardgames`` is MISSED, exactly like the reference (SURVEY.md §5.3)
4. malformed JSON -> dropped (v1 tolerant semantics, explicit filter)
5. Kafka binary key/value cast (P1)
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spark_streaming_twitter_spark.operators.trending import extract_hashtags
from spark_streaming_twitter_spark.sources.tweets import parse_tweets

# Freshly written fixture with the same structural properties as the
# reference's embedded sample (truncated RT, extended_tweet hashtag,
# appended epoch-millis timestamp).
GOLDEN_STATUS = {
    "created_at": "Tue Oct 08 04:55:35 +0000 2019",
    "id": 1181388864123456789,
    "text": "RT @boardgamer: totally hooked on this new strategy game, cannot "
    "stop playing since last we…",
    "truncated": True,
    "user": {"id": 12345, "screen_name": "someone", "followers_count": 10},
    "extended_tweet": {
        "full_text": "RT @boardgamer: totally hooked on this new strategy "
        "game, cannot stop playing since last week #boardgames",
        "entities": {"hashtags": [{"text": "boardgames", "indices": [95, 106]}]},
    },
    "retweet_count": 0,
    "lang": "en",
    "timestamp": "1570510535121",
}


def _kafka_shaped(spark, values: list[str]):
    rows = [(str(i), v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["key", "value"]).select(
        F.col("key").cast("binary"), F.col("value").cast("binary")
    )


def test_golden_payload_parses_three_fields(spark):
    df = parse_tweets(_kafka_shaped(spark, [json.dumps(GOLDEN_STATUS)]))
    r = df.collect()[0]
    assert r.text.startswith("RT @boardgamer")
    assert r.lang == "en"
    assert int(r.ts.timestamp() * 1000) == 1570510535121


def test_truncated_retweet_hashtag_is_missed_like_reference(spark):
    tweets = parse_tweets(_kafka_shaped(spark, [json.dumps(GOLDEN_STATUS)]))
    tags = extract_hashtags(tweets, "text").select("hashtag").collect()
    assert tags == [], (
        "reference extracts from text only; the extended_tweet #boardgames "
        "must be missed"
    )


def test_text_hashtags_are_extracted(spark):
    status = dict(GOLDEN_STATUS, text="loving #spark and #streaming today")
    tags = extract_hashtags(
        parse_tweets(_kafka_shaped(spark, [json.dumps(status)])), "text"
    )
    assert [r.hashtag for r in tags.collect()] == ["#spark", "#streaming"]


def test_malformed_json_rows_are_dropped(spark):
    df = parse_tweets(
        _kafka_shaped(
            spark,
            ['{"broken', json.dumps(GOLDEN_STATUS), "", "not json at all"],
        )
    )
    assert df.count() == 1


def test_missing_text_rows_are_dropped(spark):
    no_text = {"lang": "en", "timestamp": "1570510535121"}
    df = parse_tweets(_kafka_shaped(spark, [json.dumps(no_text)]))
    assert df.count() == 0


def test_ignore_corrupt_files_salvages_parquet_scan(spark, tmp_path):
    """File-level resilience twin of the row-level PERMISSIVE audit
    (jsonl_corrupt_record_audit): a 100 TB lake always contains a few
    truncated/garbage files (killed writers, partial uploads). Default
    strict mode fails the whole scan on the first bad file; with
    spark.sql.files.ignoreCorruptFiles the scan completes and returns
    every row from the readable files — the salvage-and-alert posture a
    backfill job wants (paired with a file-count audit, not silence)."""
    import pytest
    from pyspark.sql import functions as F

    good = tmp_path / "data"
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.parquet(str(good))
    (good / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a parquet file")

    strict = spark.read.parquet(str(good))
    with pytest.raises(Exception, match="PAR1|corrupt|Could not read footer|FAILED_READ_FILE"):
        strict.count()

    old = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        rows = spark.read.parquet(str(good)).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)
    assert rows == 100
