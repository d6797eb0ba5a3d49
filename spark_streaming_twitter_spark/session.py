"""SparkSession factory tuned for this engine.

The reference builds its session at TwitterDatasetTrendingHashtag.java:51-59
with whole-stage codegen *disabled*; we invert that (SURVEY.md §4): codegen
on, AQE on, Arrow on, UTC session time zone pinned for oracle parity.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark_streaming_twitter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    Local mode is a test harness only; every conf here is also the right
    default on a multi-executor cluster (AQE coalescing + skew-join handle
    the per-cluster tuning at runtime).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark's generated partial-aggregate method for multi-decimal-sum
        # plans exceeds HotSpot's 8000-byte huge-method limit, so the hot
        # loop runs bytecode-interpreted (~60x slower: 19s -> 2.8s for one
        # decimal sum over sf0.1 lineitem). Lift the limit so C2 compiles it
        # — and grow the code cache to hold the compiled output: a session
        # running many generated plans fills the 240 MB default, after which
        # the JIT stops compiling and EVERY query degrades ~4x.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=1g "
            # diagnostics passthrough (e.g. -Xlog:gc* for the driver-memory
            # probes); empty by default so the production flags stay fixed
            + os.environ.get("SPARK_GRAFT_EXTRA_JAVA_OPTS", ""),
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=1g",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
