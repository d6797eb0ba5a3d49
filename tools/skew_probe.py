"""Planted-skew measurement: price one hot join key, salted vs unsalted.

Companion to the `skewed_join_revenue_{unsalted,salted}` bench pair. At
bench scale those two time EQUAL — and the probe explains why: the fact
side's shuffle is ~18 MB, so AQE partition coalescing folds all reduce
partitions into one task and both variants run the same single-task
reduce. That is the correct adaptive behavior at small volume, and it
vanishes at 100 TB, where every partition already exceeds the 64 MB
advisory target and the hot key's partition CANNOT be coalesced away.

This probe reproduces the at-scale shape on local[32]:

- `spark.sql.adaptive.coalescePartitions.enabled=false` — partitions stay
  as hashed, like a shuffle whose partitions are already at target size;
- `spark.sql.adaptive.skewJoin.enabled=false` — AQE's skew splitter is
  measured separately as a third variant (it is the built-in fix, but it
  only engages past spark.sql.adaptive.skewJoin.skewedPartitionThreshold-
  InBytes, 256 MB default — many real skews sit below it, and streaming /
  bucketed / UDF-opaque stages are out of its reach entirely);
- the fact side is replicated REP x (explode, key distribution preserved)
  so per-task work dominates fixed overheads;
- per-task duration quantiles come from the UI REST API: the honest skew
  number is max-task / median-task in the join stage, independent of
  map-side noise.

Usage: python tools/skew_probe.py [REP]      # default 16
Prints one JSON line per variant:
  {"variant": ..., "wall_s": ..., "join_stage": {"tasks": n,
   "median_task_ms": ..., "max_task_ms": ..., "max_over_median": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SALT = 32


def build_session(skew_join: bool) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName(f"skew_probe_{skew_join}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        # engage the splitter at probe scale (defaults: 256 MB / factor 5)
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m" if skew_join else "256m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )


def fact(spark: SparkSession, rep: int) -> DataFrame:
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    li = li.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
    return li.withColumn(
        "skew_key",
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(-1)).otherwise(
            F.col("l_suppkey")
        ),
    )


def dim(spark: SparkSession) -> DataFrame:
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        F.col("s_suppkey").alias("skew_key"),
        F.col("s_nationkey").cast("bigint").alias("s_nationkey"),
    )
    hot = spark.range(1).select(
        F.lit(-1).cast("bigint").alias("skew_key"),
        F.lit(-1).cast("bigint").alias("s_nationkey"),
    )
    return sup.unionByName(hot)


def agg(j: DataFrame) -> DataFrame:
    return j.groupBy("skew_key", "s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


def unsalted(spark: SparkSession, rep: int) -> DataFrame:
    return agg(fact(spark, rep).join(dim(spark).hint("merge"), "skew_key"))


def salted(spark: SparkSession, rep: int) -> DataFrame:
    f = fact(spark, rep).withColumn(
        "salt", ((F.col("l_orderkey") * rep + F.col("rep")) % SALT).cast("int")
    )
    d = dim(spark).withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    return agg(f.join(d.hint("merge"), ["skew_key", "salt"]))


def _api(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}{path}", timeout=10
    ) as r:
        return json.load(r)


def join_stage_summary(spark: SparkSession, known: set[int]) -> dict:
    """Per-task quantiles of the new stage with the largest shuffle read —
    the SMJ reduce stage, where the hot partition lives."""
    stages = [
        s
        for s in _api(spark, "/stages?status=complete")
        if s["stageId"] not in known
    ]
    sid = max(stages, key=lambda s: s["shuffleReadBytes"])["stageId"]
    summ = _api(
        spark, f"/stages/{sid}/0/taskSummary?quantiles=0.0,0.5,1.0"
    )
    med, mx = summ["executorRunTime"][1], summ["executorRunTime"][2]
    # shuffle-read record quantiles: the contention-free skew number
    # (local[32] runs every task concurrently, so task TIMES also absorb
    # CPU contention; row counts are the pure partition-balance signal)
    rmed, rmx = (
        summ["shuffleReadMetrics"]["readRecords"][1],
        summ["shuffleReadMetrics"]["readRecords"][2],
    )
    n_tasks = next(
        s["numCompleteTasks"] for s in stages if s["stageId"] == sid
    )
    return {
        "tasks": n_tasks,
        "median_task_ms": round(med, 1),
        "max_task_ms": round(mx, 1),
        "max_over_median": round(mx / max(med, 0.001), 2),
        "median_task_rows": int(rmed),
        "max_task_rows": int(rmx),
        "rows_max_over_median": round(rmx / max(rmed, 1), 2),
    }


def run(variant: str, fn, spark: SparkSession, rep: int) -> None:
    known = {s["stageId"] for s in _api(spark, "/stages")}
    t0 = time.perf_counter()
    fn(spark, rep).collect()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "variant": variant,
                "rep": rep,
                "wall_s": round(wall, 3),
                "join_stage": join_stage_summary(spark, known),
            }
        ),
        flush=True,
    )


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = build_session(skew_join=False)
    # warm codegen/scan with a throwaway pass at rep=1
    unsalted(spark, 1).collect()
    run("unsalted", unsalted, spark, rep)
    run("salted", salted, spark, rep)
    spark.stop()
    # AQE's own skew-join splitter, threshold lowered to engage at probe
    # scale — the built-in answer where plans allow it.
    spark = build_session(skew_join=True)
    unsalted(spark, 1).collect()
    run("unsalted_aqe_skewjoin", unsalted, spark, rep)
    spark.stop()


if __name__ == "__main__":
    main()
