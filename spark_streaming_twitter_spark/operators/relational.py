"""Relational core (SURVEY.md §2.8): the operator surface the reference lacks
(§2.7 — no joins, sorts, set ops, window functions, SQL scalar functions) but
a complete engine needs. Every query is pure DataFrame API — Catalyst owns
pushdown, join strategy (broadcast vs sort-merge), partial aggregation, and
AQE runtime re-planning; nothing here hand-schedules.

Scale notes per query are in each docstring; the shared rules:
- dimension tables (region/nation/part/supplier at TPC-H ratios) are
  broadcast — no shuffle of the fact table for enrichment joins;
- fact-fact joins shuffle on the join key (sort-merge), which AQE skew-splits;
- global sorts only ever run on pre-aggregated or LIMIT'd data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from spark_streaming_twitter_spark.registry import query

# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1 shape — partial+final hash agg, 8 aggregates
# --------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: scan-filter-agg; partial+final "
    "HashAggregate, filter and 7-column pruning pushed to the parquet scan.",
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1999-12-31 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(charge).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --------------------------------------------------------------------------
# Joins: broadcast dim join + fact-fact shuffle join + top-k sort
# --------------------------------------------------------------------------


@query(
    "top_revenue_orders",
    oracle=f"""
SELECT l_orderkey AS o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3 shape: selective dim filter → broadcast customer into "
    "orders, shuffle join to lineitem on orderkey, agg, global top-10 "
    "(TakeOrderedAndProject — no full sort at scale).",
    bench=True,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "part_brand_revenue",
    oracle=f"""
SELECT p_brand,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       {dsum_sql('l_quantity')} AS total_qty,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    doc="Broadcast-dim enrichment join: part is tiny at TPC-H ratios "
    "(part:lineitem = 1:30) — broadcast it so the fact table never shuffles "
    "for the join; only the (brand) agg shuffles ~25 rows per partition.",
    bench=True,
)
def part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            dsum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "customers_with_orders",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="Left-semi join (EXISTS): orders side reduced to distinct keys "
    "map-side; no row multiplication.",
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")


@query(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="Left-anti join (NOT EXISTS).",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


@query(
    "signup_purchase_conversion",
    oracle="""
SELECT s.user_id,
       count(*) AS n_conversions
FROM (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
GROUP BY s.user_id
""",
    doc="Range/theta join: equi-join on user_id + time-band predicate — the "
    "band filter evaluates inside the join, keyed shuffle stays on user_id.",
)
def signup_purchase_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s = ev.where(F.col("event_type") == "signup").select("user_id", F.col("ts").alias("s_ts"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    j = s.join(
        p,
        (s.user_id == p.p_user_id)
        & (p.p_ts >= s.s_ts)
        & (p.p_ts <= s.s_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return j.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_conversions"))


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------


@query(
    "nation_region_rollup",
    oracle=f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {dsum_sql('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    doc="ROLLUP over a two-level broadcast-joined dim hierarchy; Spark "
    "expands to grouping sets in a single Expand+HashAggregate pass.",
)
def nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


@query(
    "order_status_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE over two low-cardinality columns (4× Expand).",
)
def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Distinct aggregation
# --------------------------------------------------------------------------


@query(
    "supplier_distinct_parts",
    oracle="""
SELECT l_suppkey,
       count(DISTINCT l_partkey) AS n_distinct_parts,
       count(*) AS n_items
FROM lineitem GROUP BY l_suppkey
""",
    doc="COUNT DISTINCT: Spark plans a two-phase distinct aggregate "
    "(partial dedup before the shuffle).",
)
def supplier_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_distinct_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


_HLL_RSD = 0.05  # requested relative standard deviation of the HLL sketch


@query(
    "approx_distinct_parts",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       CAST(1 AS INT) AS within_rsd_bound
FROM lineitem
GROUP BY l_returnflag
""",
    doc="approx_count_distinct (HyperLogLog++) — the 100 TB path for "
    "distinct counting. The sketch estimate itself is engine-specific, so "
    "the oracle is a BOUNDED check: the query emits the exact distinct "
    "count (value-compared against DuckDB's) plus a flag asserting the HLL "
    "estimate landed within 4 relative standard deviations of exact "
    "(rsd=0.05 → ±20%; HLL++ error is ~normal with σ=rsd, so 4σ holds "
    "deterministically for any fixture content while still failing on a "
    "real sketch regression).",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=_HLL_RSD).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    bound = 4.0 * _HLL_RSD * F.col("exact_parts").cast("double")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts")).cast("double")
            <= bound
        )
        .cast("int")
        .alias("within_rsd_bound"),
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "part_price_rank",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice,
       row_number() OVER (PARTITION BY p_brand
                          ORDER BY p_retailprice DESC, p_partkey ASC) AS rn,
       rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
FROM part
""",
    doc="Ranking window functions; single shuffle on p_brand serves all "
    "three ranks (same partitioning).",
)
def part_price_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    w_unique = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    w_ties = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


@query(
    "customer_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
       CAST(epoch(o_orderdate) AS BIGINT)
         - lag(CAST(epoch(o_orderdate) AS BIGINT))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS gap_seconds,
       lead(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate ASC, o_orderkey ASC)
         AS next_orderkey
FROM orders
""",
    doc="lag/lead with deterministic (date, key) ordering; inter-order gap "
    "in seconds.",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    epoch = F.unix_timestamp("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        epoch.alias("order_epoch"),
        (epoch - F.lag(epoch).over(w)).alias("gap_seconds"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "customer_running_spend",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS running_spend
FROM orders
""",
    doc="Running sum with an explicit ROWS frame; exact decimal accumulation "
    "for cross-engine parity (functions.numeric).",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@query(
    "top3_orders_per_priority",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM ranked WHERE rn <= 3
""",
    doc="Per-group top-k: rank-filter. At scale Spark pushes a per-partition "
    "top-k below the shuffle for rank filters (WindowGroupLimit).",
)
def top3_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "customer_segment_set_ops",
    oracle="""
WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
f_orders AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
SELECT 'both' AS op, k FROM (SELECT k FROM building INTERSECT SELECT k FROM f_orders)
UNION ALL
SELECT 'building_only' AS op, k FROM (SELECT k FROM building EXCEPT SELECT k FROM f_orders)
UNION ALL
SELECT 'f_only' AS op, k FROM (SELECT k FROM f_orders EXCEPT SELECT k FROM building)
""",
    doc="INTERSECT / EXCEPT / UNION ALL over key sets, tagged per branch.",
)
def customer_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    f_orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    both = building.intersect(f_orders).select(F.lit("both").alias("op"), "k")
    b_only = building.exceptAll(f_orders.distinct()).distinct().select(
        F.lit("building_only").alias("op"), "k"
    )
    f_only = f_orders.exceptAll(building.distinct()).distinct().select(
        F.lit("f_only").alias("op"), "k"
    )
    return both.unionAll(b_only).unionAll(f_only)


# --------------------------------------------------------------------------
# Scalar functions: string / date / JSON
# --------------------------------------------------------------------------


@query(
    "part_string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens,
       string_split(p_name, ' ')[1] AS first_token,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       concat(p_brand, ':', p_type) AS brand_type,
       substring(p_name, 1, 4) AS name_prefix
FROM part
""",
    doc="String scalar surface: upper/length/split/array-index/regexp_extract"
    "/concat/substring — all JVM built-ins inside one codegen stage.",
)
def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    tokens = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.size(tokens).alias("n_tokens"),
        tokens.getItem(0).alias("first_token"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
    )


@query(
    "orders_by_month",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY 1, 2
""",
    doc="Date functions: year/month extraction + monthly agg.",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    return orders.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "event_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS DOUBLE) / count(*) AS avg_k,
       max(CAST(props->>'k' AS BIGINT)) AS max_k,
       min(CAST(props->>'k' AS BIGINT)) AS min_k
FROM events
GROUP BY event_type
""",
    doc="JSON scalar path over events.props (reference parses JSON via "
    "Jackson POJO, Tweet.java:10-21; ours is get_json_object — "
    "Catalyst-visible, prunable).",
)
def event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "props")
    k = F.get_json_object("props", "$.k").cast("bigint")
    withk = ev.select("event_type", k.alias("k"))
    return withk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.min("k").alias("min_k"),
    )


# --------------------------------------------------------------------------
# Sort / limit / pivot / subquery patterns
# --------------------------------------------------------------------------


@query(
    "top_lineitems_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
""",
    doc="Global ORDER BY + LIMIT → TakeOrderedAndProject (per-partition "
    "top-k + driver merge; never a full global sort).",
)
def top_lineitems_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return li.orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ).limit(20)


@query(
    "priority_status_pivot",
    oracle=f"""
SELECT o_orderpriority,
       {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_total,
       {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS filled_total,
       {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS partial_total
FROM orders
GROUP BY o_orderpriority
""",
    doc="Pivot via conditional aggregation (single-pass, no extra shuffle "
    "vs .pivot()).",
)
def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def status_total(status: str) -> F.Column:
        return (
            F.sum(
                F.when(
                    F.col("o_orderstatus") == status,
                    F.col("o_totalprice").cast("decimal(18,6)"),
                )
            ).cast("double")
        )

    return orders.groupBy("o_orderpriority").agg(
        status_total("O").alias("open_total"),
        status_total("F").alias("filled_total"),
        status_total("P").alias("partial_total"),
    )


@query(
    "above_avg_customers_per_nation",
    oracle=f"""
WITH nation_avg AS (
  SELECT c_nationkey, {davg_sql('c_acctbal')} AS avg_bal
  FROM customer GROUP BY c_nationkey
)
SELECT n_name, count(*) AS n_rich_customers
FROM customer
JOIN nation_avg USING (c_nationkey)
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avg_bal
GROUP BY n_name
""",
    doc="Correlated-scalar-subquery pattern decorrelated into a join against "
    "a per-group aggregate (how Catalyst rewrites it anyway).",
)
def above_avg_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation_avg = cust.groupBy("c_nationkey").agg(davg("c_acctbal").alias("avg_bal"))
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )


# --------------------------------------------------------------------------
# SQL text surface (the reference's only SQL is one selectExpr cast —
# TwitterDatasetTrendingHashtag.java:74; ours is the full Spark SQL parser
# over registered fixture views)
# --------------------------------------------------------------------------


@query(
    "sql_revenue_by_region",
    oracle=f"""
SELECT r_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    doc="Same ANSI SQL text executed by BOTH engines (spark.sql over "
    "registered views vs DuckDB): five-table star join. Catalyst plans the "
    "dim chain as broadcast joins off the lineitem scan; the SQL parser "
    "surface itself is the operator under test.",
)
def sql_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "shipping_priority_topk",
    oracle=f"""
WITH scored AS (
  SELECT l_orderkey,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_epoch,
         any_value(o_orderpriority) AS o_orderpriority
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-06-15'
    AND l_shipdate  > TIMESTAMP '1998-06-15'
  GROUP BY l_orderkey, o_orderdate
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rank
  FROM scored
)
SELECT l_orderkey, revenue, orderdate_epoch, o_orderpriority,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
""",
    doc="TPC-H Q3 (shipping priority) analog: unshipped-revenue top-10 for "
    "one market segment at a date cutoff. The selective segment filter "
    "pushes into the customer scan, orders filters on the date BEFORE "
    "either join, and both dims broadcast onto the lineitem scan "
    "(customer and the filtered orders are each << lineitem at any "
    "scale); revenue accumulates through the exact-decimal path (dsum) "
    "so ranking compares bitwise-identical doubles on both engines, with "
    "l_orderkey as the deterministic tie-break. Top-10 via rank-window "
    "compiles to a WindowGroupLimit, never a full sort of the aggregate.",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1998-06-15"
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    scored = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.any_value(F.col("o_orderpriority")).alias("o_orderpriority"),
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 10)
    )


@query(
    "product_type_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {dsum_sql('l_extendedprice * (1 - l_discount)'
                 ' - p_retailprice * l_quantity * 0.6')} AS margin,
       count(*) AS n_lineitems
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 (product-type profit) analog, adapted to the fixture "
    "schema: the fixture carries no partsupp, so supply cost is modeled "
    "as 60% of p_retailprice — the join topology (lineitem at the center "
    "of a part/supplier/nation/orders star, filtered on part type, "
    "aggregated by supplier nation x order year) is Q9's. The p_type "
    "filter prunes part BEFORE its join; part/supplier/nation broadcast; "
    "orders is the one potentially-large dim and joins on the lineitem "
    "scan's own key. Margin accumulates exact-decimal (each element a "
    "deterministic scalar double expression, summed in DECIMAL(18,6)).",
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    margin_el = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.6)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            dsum(margin_el).alias("margin"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "orders_snapshot_diff",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey,
         CAST(('0x' || substr(md5(o_orderstatus || '|'
                              || CAST(o_totalprice AS VARCHAR)), 1, 15))
              AS BIGINT) AS row_hash
  FROM orders WHERE o_orderkey % 97 <> 0
),
v2src AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 2.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 101 <> 0
),
v2 AS (
  SELECT o_orderkey,
         CAST(('0x' || substr(md5(o_orderstatus || '|'
                              || CAST(o_totalprice AS VARCHAR)), 1, 15))
              AS BIGINT) AS row_hash
  FROM v2src
),
diff AS (
  SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS k,
         CASE WHEN v1.o_orderkey IS NULL THEN 'added'
              WHEN v2.o_orderkey IS NULL THEN 'removed'
              WHEN v1.row_hash <> v2.row_hash THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
)
SELECT change_type, count(*) AS n_rows,
       CAST(sum(k) AS BIGINT) AS key_checksum
FROM diff GROUP BY 1
""",
    doc="Snapshot DIFF — the table-compare primitive behind CDC "
    "validation, migration sign-off, and replication audits: two "
    "deterministic snapshot derivations of orders (disjoint delete "
    "sets, a value mutation on keys % 89) compare by KEY + ROW HASH "
    "through one full outer join, classifying every key as added / "
    "removed / changed / unchanged with a key checksum per class. The "
    "row hash is the portable md5 bridge (functions/hashing.py — the "
    "only hash both engines compute identically), concatenating the "
    "compared columns with an unambiguous separator; hashing first "
    "means the join compares one BIGINT per row regardless of row "
    "width. At 100 TB both sides shuffle once on the key (or not at "
    "all if both snapshots are bucketed by it — tests/"
    "test_storage_layout.py's layout), and the output is #classes "
    "rows; this is how you diff a billion-row table without collecting "
    "anything. DOUBLE-to-string hashing is portable here because both "
    "engines print the shortest round-trip representation (pinned "
    "green by this oracle at both SFs).",
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.functions.hashing import portable_hash

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def row_hash(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey",
            portable_hash(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    F.col("o_totalprice").cast("string"),
                )
            ).alias("row_hash"),
        )

    v1 = row_hash(orders.where(F.col("o_orderkey") % 97 != 0))
    v2 = row_hash(
        orders.where(F.col("o_orderkey") % 101 != 0).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") * 2.0
            ).otherwise(F.col("o_totalprice")),
        )
    )
    diff = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full"
    )
    classified = diff.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(F.col("a.row_hash") != F.col("b.row_hash"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return classified.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_checksum"),
    )


_EXCESS_SQL = """
SELECT s_suppkey, s_name,
       (SELECT count(*) FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey) AS n_lineitems
FROM supplier s
WHERE (SELECT count(*) FROM lineitem l
       WHERE l.l_suppkey = s.s_suppkey)
      > (SELECT count(*) FROM lineitem) / (SELECT count(*) FROM supplier)
  AND EXISTS (SELECT 1 FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE l.l_suppkey = s.s_suppkey AND p.p_type = 'PROMO')
"""


@query(
    "sql_correlated_excess_suppliers",
    oracle=_EXCESS_SQL,
    doc="Correlated scalar subqueries — the TPC-H Q17/Q20 shape: suppliers "
    "whose lineitem volume exceeds twice the per-supplier average, "
    "above-average volume via correlated scalar subqueries plus a "
    "correlated EXISTS over a join (the Q20 availability test), all "
    "executed as the SAME ANSI text on both engines. What's under test "
    "is Catalyst's DECORRELATION: the correlated `(SELECT count(*) ... "
    "WHERE l_suppkey = s_suppkey)` must rewrite to ONE aggregate over "
    "lineitem joined back on s_suppkey — not a per-supplier re-scan "
    "(O(suppliers x lineitem) at 100 TB). test_correlated_subquery_"
    "decorrelates pins exactly that plan shape: a single lineitem scan "
    "per subquery class and no nested-loop execution node.",
)
def sql_correlated_excess_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EXCESS_SQL)


@query(
    "sql_group_by_all_status_priority",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
    doc="Spark 4 `GROUP BY ALL`: the grouping keys are inferred as every "
    "non-aggregate select item — the analyzer surface, resolved before "
    "Catalyst so the physical plan is identical to the explicit form "
    "(which is what the oracle runs in DuckDB). Guards against the "
    "silent-miscount class where an added select column changes the "
    "grouping: with ALL, select list and grouping cannot diverge.",
)
def sql_group_by_all_status_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY ALL
        """
    )


@query(
    "sql_parameterized_segment_revenue",
    oracle=f"""
SELECT c_mktsegment,
       count(DISTINCT o_orderkey) AS n_orders,
       {dsum_sql('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY c_mktsegment
""",
    doc="Parameterized SQL (Spark 4 named-parameter markers): the query "
    "text carries :segs and :since placeholders and the VALUES arrive "
    "via spark.sql(..., args=...) — the injection-safe templating "
    "surface a multi-tenant serving layer needs (literals arrive as "
    "typed values, never string-spliced). The bound plan is identical "
    "to the literal form the oracle runs; array parameter binds "
    "through IN via array_contains semantics.",
)
def sql_parameterized_segment_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(DISTINCT o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE array_contains(:segs, c_mktsegment)
          AND o_orderdate >= :since
        GROUP BY c_mktsegment
        """,
        args={
            "segs": ["BUILDING", "MACHINERY"],
            "since": "1996-01-01 00:00:00",
        },
    )


@query(
    "sql_session_variables_revenue",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
WHERE o_totalprice > 300000.0
GROUP BY o_orderpriority
""",
    doc="SQL session variables + parameterized identifier (Spark 4 "
    "scripting surface): the threshold lives in a DECLAREd session "
    "variable set by SET VAR (typed, session-scoped — the way a SQL "
    "workflow threads config between statements without string "
    "templating), and the table name binds through IDENTIFIER(:tbl) "
    "(the injection-safe dynamic-relation marker). The planned query "
    "is identical to the literal form the oracle runs — variables "
    "fold to literals at analysis, so pushdown/pruning are unchanged.",
)
def sql_session_variables_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR price_floor = 300000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_price
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > price_floor
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders"},
    )


@query(
    "sql_lateral_top_orders",
    oracle=f"""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice_cents, t.rk
FROM customer c,
     LATERAL (
       SELECT o_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT)
                AS o_totalprice_cents,
              row_number() OVER (ORDER BY o_totalprice DESC,
                                 o_orderkey ASC) AS rk
       FROM orders
       WHERE o_custkey = c.c_custkey
       ORDER BY o_totalprice DESC, o_orderkey ASC
       LIMIT 2
     ) t
WHERE c.c_custkey % 50 = 0
""",
    doc="Correlated LATERAL derived-table join (SQL:1999 lateral; Spark "
    "3.2+): each customer row drives a dependent subquery returning its "
    "top-2 orders — the 'top-N per outer row' idiom BI tools emit. "
    "Catalyst DECORRELATES it into one per-key rank window + rank "
    "filter + equi join on the correlation key rather than executing "
    "per-row subqueries — which is the entire 100 TB story: a naive "
    "nested-loop evaluation is O(customers x orders), the decorrelated "
    "plan is one shuffle on the correlation key (the rank-predicate "
    "form, deliberately: the ORDER BY+LIMIT lateral form decorrelates "
    "with a leftover GLOBAL range sort — pinned against regression). "
    "DuckDB executes the LATERAL natively as the oracle. The rk column "
    "is emitted so the per-group ordering itself is hash-checked; "
    "cents-integer prices keep the compare exact.",
)
def sql_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    # rank-predicate form, NOT "ORDER BY ... LIMIT 2" inside the lateral:
    # the limit form decorrelates with a leftover GLOBAL range sort and no
    # WindowGroupLimit; filtering on the windowed rank decorrelates to the
    # map-side-pruned rank plan (pinned in test_plan_shapes).
    return spark.sql(
        """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice_cents, t.rk
FROM customer c,
     LATERAL (
       SELECT o_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT)
                AS o_totalprice_cents,
              row_number() OVER (ORDER BY o_totalprice DESC,
                                 o_orderkey ASC) AS rk
       FROM orders
       WHERE o_custkey = c.c_custkey
     ) t
WHERE c.c_custkey % 50 = 0 AND t.rk <= 2
"""
    )


@query(
    "sql_script_threshold_search",
    oracle="""
WITH lad AS (
  SELECT k, 1000 * (CAST(1 AS BIGINT) << k) AS thr
  FROM (SELECT unnest(generate_series(0, 40)) AS k)
),
counts AS (
  SELECT l.k, l.thr, count(o.o_orderkey) AS n_above
  FROM lad l LEFT JOIN orders o ON o.o_totalprice > l.thr
  GROUP BY 1, 2
),
pick AS (SELECT min(k) AS k FROM counts WHERE n_above <= 1000)
SELECT c.thr AS threshold,
       CAST(c.n_above AS BIGINT) AS n_above,
       CAST(c.k AS INT) AS n_steps
FROM counts c JOIN pick p ON c.k = p.k
""",
    doc="Spark 4 SQL SCRIPTING (BEGIN...END, DECLARE, data-dependent "
    "WHILE): a doubling search for the smallest power-of-two price "
    "cutoff isolating at most 1000 premium orders — each iteration is "
    "a full Catalyst query (scan + pushed-down predicate + count) whose "
    "result drives the loop condition through a scalar subquery into a "
    "script variable; the loop runs O(log range) passes. This is the "
    "control-flow surface for genuinely SEQUENTIAL logic (each step's "
    "predicate depends on the last step's result — adaptive sampling, "
    "backoff, convergence loops); for THIS particular ladder a single "
    "conditional-aggregation pass is the throughput shape (the oracle "
    "runs exactly that form), which is the honest trade: scripting buys "
    "expressiveness, not fewer scans. Conf-scoped "
    "(spark.sql.scripting.enabled, restored in finally) and "
    "materialized inside the scope.",
)
def sql_script_threshold_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import register_views

    register_views(spark, sf_dir)
    key = "spark.sql.scripting.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:  # noqa: BLE001 — unset in a vanilla session
        prev = None
    spark.conf.set(key, "true")
    try:
        out = spark.sql(
            """
BEGIN
  DECLARE thr BIGINT DEFAULT 1000;
  DECLARE cnt BIGINT DEFAULT -1;
  DECLARE steps INT DEFAULT 0;
  SET cnt = (SELECT count(*) FROM orders WHERE o_totalprice > thr);
  WHILE cnt > 1000 DO
    SET thr = thr * 2;
    SET cnt = (SELECT count(*) FROM orders WHERE o_totalprice > thr);
    SET steps = steps + 1;
  END WHILE;
  SELECT thr AS threshold, cnt AS n_above, steps AS n_steps;
END
"""
        )
        rows = out.collect()
        result = spark.createDataFrame(rows, out.schema)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return result
