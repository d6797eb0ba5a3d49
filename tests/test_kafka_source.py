"""Kafka source builder: options wiring + offline fallback contract.

No broker and no connector jar exist in the sandbox, so these tests pin
(a) the exact reader options the reference uses
(TwitterDatasetTrendingHashtag.java:64-72), (b) the precise failure when
the connector is absent, and (c) that the fallback produces the identical
Kafka shape so the downstream parse pipeline is source-agnostic.
"""

from __future__ import annotations

import json

import pytest

from spark_streaming_twitter_spark.sources.kafka import (
    KAFKA_PACKAGE,
    kafka_reader_options,
    kafka_stream,
)
from spark_streaming_twitter_spark.sources.tweets import parse_tweets
from spark_streaming_twitter_spark.streaming.harness import run_to_memory


def test_reader_options_match_reference():
    opts = kafka_reader_options(
        "broker1:9092,broker2:9092",
        "tweets",
        starting_offsets="earliest",
        max_offsets_per_trigger=100_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "tweets",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "100000",
    }


def test_missing_connector_names_the_package(spark):
    with pytest.raises(RuntimeError, match=KAFKA_PACKAGE.replace(".", r"\.")):
        kafka_stream(spark, "localhost:9092", "tweets")


def test_fallback_is_kafka_shaped_and_parses(spark, tmp_path):
    lines = [
        json.dumps({"text": "hello #world", "timestamp": "1700000000000", "lang": "en"}),
        '{"broken',
    ]
    (tmp_path / "part-0.txt").write_text("\n".join(lines))
    stream = kafka_stream(
        spark, "localhost:9092", "tweets", fallback_dir=str(tmp_path)
    )
    assert stream.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in stream.schema.fields] == [
        ("key", "binary"),
        ("value", "binary"),
    ]
    out = run_to_memory(parse_tweets(stream), output_mode="append").collect()
    assert len(out) == 1  # malformed row dropped by the PERMISSIVE+filter path
    assert out[0].text == "hello #world" and out[0].lang == "en"
