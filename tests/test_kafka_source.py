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


def test_reference_wiring_is_a_config_flip():
    """The exact reader TwitterDatasetTrendingHashtag.java:64-72 constructs,
    expressed through our builder: a broker-equipped environment needs only
    these values plus the --packages coordinate — no new code."""
    import pyspark

    ref_bootstrap = "10.71.69.236:31117,10.71.69.236:31118,10.71.69.236:31119"
    opts = kafka_reader_options(ref_bootstrap, "tweeter-topic")
    assert opts == {
        "kafka.bootstrap.servers": ref_bootstrap,
        "subscribe": "tweeter-topic",
        # The reference sets no startingOffsets; "latest" is the streaming
        # default it actually runs with, and we pin it explicitly.
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
    }
    # The reference also passes enable.auto.commit=true (:70) — a consumer
    # option Structured Streaming manages itself (offsets live in the
    # checkpoint, not the consumer group), so the builder omits it on
    # purpose rather than forwarding a no-op.
    assert "enable.auto.commit" not in opts
    # Full spark-submit coordinate: correct group, artifact matching
    # pyspark's Scala 2.13 build, version matching the installed Spark.
    group, artifact = KAFKA_PACKAGE.split(":")
    assert group == "org.apache.spark"
    assert artifact == "spark-sql-kafka-0-10_2.13"
    assert f"{KAFKA_PACKAGE}:{pyspark.__version__}".count(":") == 2


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
