"""Kafka source builder — the reference's actual ingest path.

The reference subscribes to a tweet topic with a bootstrap-server list and
an offset policy (TwitterDatasetTrendingHashtag.java:64-72: format("kafka"),
kafka.bootstrap.servers, subscribe, startingOffsets) and immediately casts
key/value to strings (:74 — our ``sources.tweets.parse_tweets`` does the
cast + JSON parse). This module wires the identical reader; everything
downstream of ``load()`` is source-agnostic, which is the point of the
Structured Streaming source abstraction.

The sandbox has neither a broker nor the ``spark-sql-kafka-0-10`` connector
jar (it is not part of the pyspark wheel), so ``kafka_stream`` detects the
missing data source and either raises a precise error naming the package to
add, or — with ``fallback_dir`` — substitutes the offline file-source
harness that produces the same (key binary, value binary) schema, keeping
every downstream plan unchanged. On a real cluster:
``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"

# Kafka-shaped output contract: what a kafka scan projects after the
# reference's P1 cast-projection prunes it (key/value only).
KAFKA_SHAPE = ("key", "value")


def kafka_reader_options(
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The reference's reader options, named per the Spark Kafka source.

    ``maxOffsetsPerTrigger`` is the scale guard the reference lacks: it
    bounds micro-batch size so a backlogged topic can't produce an
    arbitrarily large first batch after recovery.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": subscribe,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
    fallback_dir: str | None = None,
) -> DataFrame:
    """(key binary, value binary) stream from Kafka, or the offline stand-in.

    Returns the pruned Kafka shape so downstream code (``parse_tweets``)
    is identical whether the rows came from a broker or the file harness.
    """
    reader = spark.readStream.format("kafka").options(
        **kafka_reader_options(
            bootstrap_servers,
            subscribe,
            starting_offsets,
            fail_on_data_loss,
            max_offsets_per_trigger,
        )
    )
    try:
        return reader.load().select(*KAFKA_SHAPE)
    except Exception as exc:
        # Fall back ONLY on the connector-absent error (AnalysisException
        # DATA_SOURCE_NOT_FOUND). Any other Kafka exception — bad
        # startingOffsets JSON, conflicting subscribe options, auth — must
        # surface: silently substituting the file harness for a
        # misconfigured broker would run the pipeline on stand-in data.
        msg = str(exc)
        connector_absent = (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find the data source" in msg
            or "Failed to find data source" in msg
        )
        if not connector_absent:
            raise
        if fallback_dir is None:
            raise RuntimeError(
                "The Kafka connector is not on the classpath; add "
                f"--packages {KAFKA_PACKAGE}:<spark-version> or pass "
                "fallback_dir= for the offline file-source harness."
            ) from exc
        raw = spark.readStream.text(fallback_dir)
        return raw.select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
        )
