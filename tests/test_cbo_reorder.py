"""Cost-based-optimizer scale proof: with table + column statistics, the
optimizer rewrites a badly-ordered 3-table join so the SELECTIVE dimension
join runs first — the join-reorder lever a 100 TB warehouse leans on when
query authors (or BI generators) write joins in arbitrary order.

The query joins lineitem->orders first (a pure FK join: zero reduction,
the worst possible first join) and only then the supplier dim filtered to
one nation (~1/25 selectivity). Rule-based Spark keeps the written order;
with spark.sql.cbo.{enabled,joinReorder.enabled} and ANALYZE TABLE stats,
the star-schema cost model joins the filtered supplier dim against
lineitem FIRST, shrinking the intermediate ~25x before the orders join.

Runs in a subprocess with its own JVM: stats need a metastore-backed
table (ANALYZE TABLE), whose derby files land in cwd at session creation.

The reorder is asserted structurally: in the depth-first optimizedPlan
print of the left-deep tree, the relation joined INNERMOST prints before
the one joined last — supplier_c before orders_c iff the reorder fired.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession

sys.path.insert(0, {repo!r})
from spark_streaming_twitter_spark.catalog import table

SF = "/root/testdata/sf0.001"
results = {{}}
for cbo in (False, True):
    spark = (
        SparkSession.builder.master("local[4]").appName(f"cbo_{{cbo}}")
        .config("spark.sql.warehouse.dir", {wh!r} + str(cbo))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.cbo.enabled", str(cbo).lower())
        .config("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    table(spark, SF, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    ).write.mode("overwrite").saveAsTable("lineitem_c")
    table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").saveAsTable("orders_c")
    table(spark, SF, "supplier").select(
        "s_suppkey", "s_nationkey"
    ).write.mode("overwrite").saveAsTable("supplier_c")
    for t, cols in (
        ("lineitem_c", "l_orderkey,l_suppkey"),
        ("orders_c", "o_orderkey"),
        ("supplier_c", "s_suppkey,s_nationkey"),
    ):
        spark.sql(f"ANALYZE TABLE {{t}} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {{t}} COMPUTE STATISTICS FOR COLUMNS {{cols}}")
    nk = spark.sql(
        "SELECT min(s_nationkey) AS nk FROM supplier_c"
    ).collect()[0]["nk"]
    df = spark.sql(f'''
      SELECT count(*) AS n
      FROM lineitem_c l
      JOIN orders_c o ON l.l_orderkey = o.o_orderkey
      JOIN supplier_c s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey = {{nk}}
    ''')
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    results[cbo] = (
        plan.index("supplier_c") < plan.index("orders_c"),
        df.collect()[0]["n"],
    )
    spark.stop()

(rb_supplier_first, rb_n), (cbo_supplier_first, cbo_n) = (
    results[False], results[True]
)
assert not rb_supplier_first, "rule-based plan must keep the written order"
assert cbo_supplier_first, "CBO must join the filtered dim innermost"
assert rb_n == cbo_n and rb_n > 0, (rb_n, cbo_n)
print("CBO_REORDER_OK", rb_n)
"""


def test_cbo_stats_reorder_selective_dim_first(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, wh=str(tmp_path / "wh"))
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # derby metastore_db/derby.log land here
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CBO_REORDER_OK" in r.stdout
