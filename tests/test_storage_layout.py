"""Storage-layout scale proofs: bucketed co-located joins and partition
pruning — the two table-layout levers a 100 TB deployment leans on.

The fixtures are single flat parquet files, so this test materializes small
copies with the production layout and asserts the PLAN changes (no shuffle
for the bucketed join; pruned partition count for the partitioned scan).

Runs in a subprocess with its own JVM: bucketing needs a metastore +
warehouse, whose locations are fixed at session creation — inside the
shared pytest session they would land in the repo working directory.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, {repo!r})
from spark_streaming_twitter_spark.catalog import table

SF = "/root/testdata/sf0.001"
spark = (
    SparkSession.builder.master("local[4]").appName("layout")
    .config("spark.sql.warehouse.dir", {wh!r})
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

orders = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
orders.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy(
    "o_orderkey").saveAsTable("orders_b")
li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy(
    "l_orderkey").saveAsTable("lineitem_b")

j = spark.table("orders_b").join(
    spark.table("lineitem_b"), F.col("o_orderkey") == F.col("l_orderkey"))
plan = j._jdf.queryExecution().executedPlan().toString()
assert "SortMergeJoin" in plan, plan
assert "Exchange hashpartitioning" not in plan, (
    "bucketed join must not shuffle:\n" + plan)

flat = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
flat_plan = flat._jdf.queryExecution().executedPlan().toString()
assert "Exchange hashpartitioning" in flat_plan, flat_plan
assert j.count() == flat.count()
print("BUCKETED_JOIN_OK")

out = {out!r}
ev = table(spark, SF, "events").select("event_id", "event_type", "user_id")
ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
filtered = spark.read.parquet(out).where(F.col("event_type") == "purchase")
pplan = filtered._jdf.queryExecution().executedPlan().toString()
assert "PartitionFilters" in pplan and "purchase" in pplan, pplan
assert filtered.count() == ev.where(F.col("event_type") == "purchase").count()
print("PARTITION_PRUNING_OK")
"""


def test_bucketing_and_partition_pruning(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(
        repo=repo,
        wh=str(tmp_path / "warehouse"),
        out=str(tmp_path / "events_by_type"),
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # derby metastore_db/derby.log land here
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "BUCKETED_JOIN_OK" in r.stdout
    assert "PARTITION_PRUNING_OK" in r.stdout
