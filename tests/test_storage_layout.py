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


def _file_stats(path, cols):
    """Per-file (min, max) footer statistics for the given columns."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        out.append((lo, hi))
    return out


def _overlapping(stats, box):
    """Count files whose footer min/max intersects the predicate box."""
    n = 0
    for lo, hi in stats:
        if all(hi[c] >= lo_v and lo[c] <= hi_v for c, (lo_v, hi_v) in box.items()):
            n += 1
    return n


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path, sf_dir):
    """Write part 16-ways cut by (a) a p_size sort and (b) the Morton code
    of (p_size, p_retailprice), then count files whose parquet FOOTER
    min/max stats survive a predicate — the exact skip-index mechanics a
    lake engine applies before reading a byte. The single-column layout
    prunes a size predicate but reads EVERY file for a price predicate;
    the z-order layout bounds both dimensions per file, so it prunes both
    predicates. This is the measured claim behind part_zorder_cells."""
    from pyspark.sql import functions as F

    from spark_streaming_twitter_spark.catalog import table
    from spark_streaming_twitter_spark.operators.layout import morton2

    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    # normalize BOTH keys to the full 16-bit space from the data's real
    # range — the interleave only balances dimensions when both use all
    # 16 bits (the production recipe: scale by observed min/max)
    pmin, pmax = part.agg(
        F.min("p_retailprice"), F.max("p_retailprice")
    ).first()
    span = pmax - pmin
    zval = morton2(
        F.col("p_size").cast("bigint") * F.lit(1310),
        F.floor(
            (F.col("p_retailprice") - F.lit(pmin)) / F.lit(span) * 65535.0
        ).cast("bigint"),
    )

    lin_dir = str(tmp_path / "part_by_size")
    z_dir = str(tmp_path / "part_by_zorder")
    part.repartitionByRange(16, "p_size", "p_partkey").write.mode(
        "overwrite"
    ).parquet(lin_dir)
    part.withColumn("zval", zval).repartitionByRange(
        16, "zval", "p_partkey"
    ).drop("zval").write.mode("overwrite").parquet(z_dir)

    cols = ("p_size", "p_retailprice")
    lin = _file_stats(lin_dir, cols)
    zs = _file_stats(z_dir, cols)
    assert len(lin) == len(zs) == 16

    # the price box derives from the table's real range (fixture SFs differ)
    size_box = {"p_size": (10, 15)}
    price_box = {"p_retailprice": (pmin + 0.25 * span, pmin + 0.45 * span)}

    # size predicate: both layouts prune (z bounds size per cell too,
    # more loosely — range-cut z-files are unaligned rectangles)
    assert _overlapping(lin, size_box) <= 4
    assert _overlapping(zs, size_box) <= 10
    # price predicate: the size-sorted layout cannot prune AT ALL —
    # every file's price range spans the table — while z-order bounds
    # price per file and skips most of them
    lin_price = _overlapping(lin, price_box)
    z_price = _overlapping(zs, price_box)
    assert lin_price == 16, f"expected no pruning for linear: {lin_price}"
    assert z_price <= 8, f"z-order should bound price per file: {z_price}"


def test_small_file_compaction_preserves_content(spark, tmp_path):
    """Maintenance compaction — the OPTIMIZE primitive on plain parquet:
    a 64-small-file table bin-packs into a handful of right-sized files
    with identical content (count + key checksum) and fewer scan tasks.
    At 100 TB this runs per-partition with a target file size; here the
    invariants are what's pinned: content-preserving, file-count-reducing,
    scan-task-reducing."""
    from pyspark.sql import functions as F

    from spark_streaming_twitter_spark.catalog import table

    src = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type"
    )
    small = str(tmp_path / "small")
    src.repartition(64).write.parquet(small)
    n_small = len(
        [f for f in __import__("os").listdir(small) if f.endswith(".parquet")]
    )
    assert n_small == 64

    before = spark.read.parquet(small).agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("chk")
    ).collect()[0]

    # compaction: coalesce to ceil(bytes / target) output files
    import math
    import os

    total_bytes = sum(
        os.path.getsize(os.path.join(small, f))
        for f in os.listdir(small)
        if f.endswith(".parquet")
    )
    target = 256 * 1024  # fixture-sized stand-in for a 256 MB target
    n_out = max(1, math.ceil(total_bytes / target))
    compacted = str(tmp_path / "compacted")
    spark.read.parquet(small).coalesce(n_out).write.parquet(compacted)

    n_comp = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    assert n_comp < n_small, (n_comp, n_small)

    after = spark.read.parquet(compacted).agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("chk")
    ).collect()[0]
    assert (before["n"], before["chk"]) == (after["n"], after["chk"])

    # fewer scan tasks for the downstream reader
    t_small = spark.read.parquet(small).rdd.getNumPartitions()
    t_comp = spark.read.parquet(compacted).rdd.getNumPartitions()
    assert t_comp <= t_small
