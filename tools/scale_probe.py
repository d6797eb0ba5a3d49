"""Scaling probe: replicate the sf0.1 fixtures Nx into /tmp with shifted
keys, then run the bench set against the scaled copy.

Evidence for the SCALE.md claims: if an operator's plan is scale-free, its
runtime should grow ~linearly (or sub-linearly, for fixed-size outputs)
with input volume — superlinear growth exposes an accidental O(n^2) or a
driver-side bottleneck. Usage:

    python tools/scale_probe.py [N]       # default N=4
    SPARK_GRAFT_SF_DIR=<out> python bench.py

Writes to /tmp/spark_graft_scale_sf<N>x and prints the bench command.
Key columns are shifted by replica * stride so replicated rows stay
distinct and id-derived sampling/bucketing keeps its distribution;
`ts` columns are left as-is (windows just get denser, which is the
realistic high-volume shape).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000  # larger than any fixture key

# key columns to shift per table so replicas don't collide
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# tiny dims are not replicated (they are fixed-size at any SF)
NO_REPLICATE = {"region", "nation"}


def replicate(df: DataFrame, keys: list[str], n: int) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__rep")
    out = df.select("*", reps)
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("__rep") * F.lit(STRIDE))
    return out.drop("__rep")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_dir = f"/tmp/spark_graft_scale_sf{n}x"
    from spark_streaming_twitter_spark.catalog import table
    from spark_streaming_twitter_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    for t, keys in KEYS.items():
        if t == "events":
            # keep ts as raw INT64 nanos so BOTH readers of the copy see
            # the fixture shape: catalog.table converts bigint ts at read
            # time, and stream_events' declared LongType schema matches.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{SRC}/{t}.parquet")
        else:
            # catalog.table handles the events TIMESTAMP(NANOS) quirk
            df = table(spark, SRC, t)
        if t not in NO_REPLICATE:
            df = replicate(df, keys, n)
        out = f"{out_dir}/{t}.parquet"
        df.coalesce(8).write.mode("overwrite").parquet(out)
        # count the WRITTEN parquet — counting df would re-run the whole
        # replicate pipeline a second time just for the log line
        print(f"{t}: {spark.read.parquet(out).count()} rows")
    print(f"\nrun: SPARK_GRAFT_SF_DIR={out_dir} python bench.py")


if __name__ == "__main__":
    main()
