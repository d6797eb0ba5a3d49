"""Adaptive-execution scale proofs: the runtime plan levers that matter
when static estimates are wrong — which at 100 TB they always are.

1. AQE join demotion: a selective filter makes one join side tiny at
   RUNTIME, but the static estimate (whole-file sizeInBytes; no CBO) still
   says "big", so the initial plan is a SortMergeJoin. AQE re-optimizes on
   the materialized shuffle statistics and converts to BroadcastHashJoin —
   the lever that rescues every filtered fact-fact join whose selectivity
   the planner can't see.

2. Join strategy hints: the full hint surface (BROADCAST / MERGE /
   SHUFFLE_HASH / SHUFFLE_REPLICATE_NL) each produces its named physical
   join — the manual override when neither stats nor AQE pick the right
   strategy (e.g. a broadcast the user knows fits, a replicate-NL for a
   tiny non-equi side).

Runtime-settable SQLConfs only, saved and restored around each test — the
shared session fixture is untouched for other tests.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table

SF = "/root/testdata/sf0.001"


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_demotes_smj_to_broadcast_at_runtime(spark):
    with _confs(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",  # static: never
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__autoBroadcastJoinThreshold": "8m",
        },
    ):
        li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        # selective filter the static planner can't price (no CBO stats)
        orders = (
            table(spark, SF, "orders")
            .where(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy().agg(
            F.count(F.lit(1)).alias("n")
        )
        initial = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in initial, initial
        assert "isFinalPlan=false" in initial, initial
        n = j.collect()[0]["n"]
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, final
        assert "BroadcastHashJoin" in final, (
            "AQE must demote the SMJ to broadcast on runtime stats:\n" + final
        )
        # answer equals the statically-broadcast plan's
        with _confs(spark, spark__sql__autoBroadcastJoinThreshold="64m"):
            li2 = table(spark, SF, "lineitem").select("l_orderkey")
            o2 = (
                table(spark, SF, "orders")
                .where(F.col("o_totalprice") > 400000)
                .select("o_orderkey")
            )
            assert n == li2.join(o2, li2.l_orderkey == o2.o_orderkey).count()


def test_join_strategy_hint_surface(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, SF, "orders").select("o_orderkey")
    cond = li.l_orderkey == orders.o_orderkey
    with _confs(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
        for hint, node in (
            ("broadcast", "BroadcastHashJoin"),
            ("merge", "SortMergeJoin"),
            ("shuffle_hash", "ShuffledHashJoin"),
        ):
            plan = (
                li.join(orders.hint(hint), cond)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert node in plan, (hint, plan)
        # replicate-NL: the explicit fallback for tiny non-equi sides
        nl = li.join(
            orders.hint("shuffle_replicate_nl"),
            li.l_orderkey >= orders.o_orderkey,
        )
        plan = nl._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" in plan, plan
