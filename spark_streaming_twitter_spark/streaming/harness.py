"""Structured Streaming harness: file sources in, memory/foreachBatch out.

The reference's source is Kafka (TwitterDatasetTrendingHashtag.java:64-72);
swapping the source is a one-line change in Structured Streaming, so the
offline harness reads the same fixture parquet as an unbounded stream. The
sink side replaces the reference's per-record InfluxDB ForeachWriter
(TwitterDatasetTrendingHashtag.java:212-367) with ``foreachBatch`` /
``memory`` sinks — batch-at-a-time, executor-side, connection-per-partition.

``run_to_memory`` drives a query synchronously (``processAllAvailable`` then
``stop``) and hands back the result as a batch DataFrame — which is how the
streaming queries participate in the driver's DuckDB-oracle gate: final
streaming state must equal the batch/SQL answer over the same data.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable, Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw parquet schema of the events fixture: ts is TIMESTAMP(NANOS), which
# Spark reads as LONG under spark.sql.legacy.parquet.nanosAsLong (set here
# and converted right after load — same handling as catalog.table).
_EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events fixture as an unbounded stream (file source).

    On a cluster this is ``readStream.format("kafka")`` + ``from_json``; the
    downstream plan is identical either way — that indirection is the point
    of Structured Streaming's source abstraction.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(_EVENTS_RAW_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # the file stream source wants a DIRECTORY: the driver fixture keeps
    # events.parquet as a single file (stream the parent dir with a glob
    # filter), while rewritten copies (tools/scale_probe.py) are parquet
    # directories (stream the directory itself)
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        raw = reader.load(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


@contextmanager
def _scoped_shuffle_partitions(spark: SparkSession) -> Iterator[None]:
    """Pin shuffle partitions to cluster parallelism for a streaming run.

    Streaming state stores can't be AQE-coalesced: every micro-batch of a
    stateful query runs one task (and one state-store instance) per shuffle
    partition, so a vanilla 200-partition session pays 200 tasks per
    trigger over kilobyte-scale fixture state. Scope the conf to the query
    (the value is captured at stream start) and restore it after, leaving
    the caller's session untouched.
    """
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def run_to_memory(
    sdf: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink.

    Synchronous: processes everything currently available, stops the query,
    returns the sink table as a batch DataFrame. ``complete`` mode gives the
    full final result table for aggregations (the oracle-comparable form);
    ``append`` is for non-aggregating or watermark-closed output.
    """
    spark = sdf.sparkSession
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    with _scoped_shuffle_partitions(spark):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    return spark.table(name)


def run_available_now(
    sdf: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame under ``Trigger.AvailableNow`` to a memory sink.

    Unlike :func:`run_to_memory` (which drives an always-on query with
    ``processAllAvailable`` and then stops it from the outside), AvailableNow
    is the CATCH-UP trigger: the query plans the data available at start,
    processes it — honoring source rate limits such as ``maxFilesPerTrigger``,
    so a backlog drains as several bounded micro-batches, not one giant one —
    and terminates ITSELF. ``awaitTermination`` here really waits for the
    query's own end-of-input shutdown, which is the semantics a scheduled
    (cron-style) incremental job relies on at 100 TB: bounded work per run,
    exactly-once via the same checkpoint across runs.
    """
    spark = sdf.sparkSession
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    with _scoped_shuffle_partitions(spark):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
    return spark.table(name)


def run_foreach_batch(
    sdf: DataFrame,
    write_batch: Callable[[DataFrame, int], None],
    output_mode: str = "update",
) -> None:
    """Drive a stream through a foreachBatch sink to completion.

    ``write_batch(df, epoch_id)`` runs on the driver but the DataFrame it
    receives is distributed — writers should call df.write / df.foreachPartition
    so the actual I/O happens on executors, one connection per partition per
    epoch (vs the reference's connection per RECORD,
    TwitterDStreamTrendingHashtag.java:102-104).
    """
    with _scoped_shuffle_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.foreachBatch(write_batch)
            .outputMode(output_mode)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
