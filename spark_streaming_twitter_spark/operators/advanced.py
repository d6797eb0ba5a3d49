"""Advanced relational operators: as-of join, exact quantiles, skew-safe
salted aggregation, array functions, grouping sets, unpivot.

These are the §2.8 operators Spark has no single built-in for — each is a
COMPOSITION of DataFrame primitives (the survey's design rule: custom
operators become compositions first, Pandas UDFs only when semantics force
it; none of these do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table, register_views
from spark_streaming_twitter_spark.functions.numeric import dsum, dsum_sql
from spark_streaming_twitter_spark.registry import query


@query(
    "asof_signup_before_purchase",
    oracle="""
WITH signups AS (
  SELECT user_id, ts FROM events WHERE event_type = 'signup'
),
purchases AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       CAST(floor(epoch(s.ts)) AS BIGINT) AS signup_epoch,
       CAST(floor(epoch(p.ts)) - floor(epoch(s.ts)) AS BIGINT) AS gap_seconds
FROM purchases p
ASOF JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    doc="As-of (backward) join — each purchase matched to the latest "
    "signup at-or-before it. Spark lacks ASOF JOIN (DuckDB's is native, "
    "which is the oracle); the composition is the union-tag trick: union "
    "both sides, one window pass per user carries the last signup ts "
    "forward (last_value ignoring nulls), filter to purchases. ONE shuffle "
    "on user_id — same cost as a co-partitioned merge join; never builds "
    "the O(purchases x signups) range-join intermediate.",
    bench=True,
)
def asof_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    tagged = ev.where(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "ts",
        # signups sort before purchases at equal ts, so a same-instant
        # signup is visible to the purchase (matches ASOF's ts >= semantics)
        F.when(F.col("event_type") == "signup", 0).otherwise(1).alias("tag"),
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_signup_ts", F.last("signup_ts", ignorenulls=True).over(w)
    )
    return (
        carried.where((F.col("tag") == 1) & F.col("last_signup_ts").isNotNull())
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("purchase_epoch"),
            F.unix_timestamp("last_signup_ts").alias("signup_epoch"),
            (F.unix_timestamp("ts") - F.unix_timestamp("last_signup_ts")).alias(
                "gap_seconds"
            ),
        )
    )


@query(
    "exact_value_quantiles",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS median_value,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90_value,
       max(CASE WHEN rn = n THEN value END) AS max_value
FROM ranked
GROUP BY event_type
""",
    doc="Exact quantiles via rank selection (value at ceil(q*n) in "
    "(value, id) order) — deterministic under ties and engine-portable, "
    "unlike interpolating percentile built-ins whose interpolation "
    "formulas differ. One shuffle on the group key; at 100 TB swap in "
    "approx_percentile for fixed-size sketches (see approx_distinct_parts "
    "for the sketch-class pattern).",
)
def exact_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )

    def at(q_expr) -> F.Column:
        return F.max(F.when(F.col("rn") == q_expr, F.col("value")))

    return ranked.groupBy("event_type").agg(
        at(F.ceil(0.5 * F.col("n"))).alias("median_value"),
        at(F.ceil(0.9 * F.col("n"))).alias("p90_value"),
        at(F.col("n")).alias("max_value"),
    )


@query(
    "salted_user_event_counts",
    oracle="SELECT user_id, count(*) AS n_events FROM events GROUP BY 1",
    doc="Skew-safe two-stage aggregation: stage 1 counts per (key, salt) "
    "with salt = event_id % 8 — a hot key's rows spread over 8 reducers — "
    "stage 2 sums the 8 partials per key. Identical result to the plain "
    "groupBy (the oracle), 8x the partial rows, no hot partition. The "
    "pattern to reach for when AQE skew handling isn't enough (e.g. "
    "a single null-ish join/group key owning 30%% of a 100 TB table).",
)
def salted_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    stage1 = ev.groupBy(
        "user_id", (F.col("event_id") % 8).alias("salt")
    ).agg(F.count(F.lit(1)).alias("partial_n"))
    return stage1.groupBy("user_id").agg(F.sum("partial_n").alias("n_events"))


# --- Planted-skew join bench pair (VERDICT r5 #5) -------------------------
#
# One synthetic hot supplier key (-1) owns every 5th lineitem (~20% of the
# table). Counts/sums under a hot GROUP BY key don't skew in Spark — hash
# partial aggregation emits one partial per key per map task — so the
# surface where skew actually bites is the shuffle JOIN: sort-merge
# co-partitions both sides on the key, and the hot key's task sorts and
# probes ~20% of the fact table alone. AQE's skew-join split does not
# engage at bench scale (spark.sql.adaptive.skewJoin
# skewedPartitionThresholdInBytes defaults to 256 MB), which mirrors the
# many real plans AQE can't rebalance (streaming joins, bucketed scans,
# UDF-opaque stages) — salting is the manual lever. The pair is
# oracle-twinned and benched for continuity; the MEASUREMENT lives in
# tools/skew_probe.py, because at bench scale AQE coalesces the ~18 MB
# shuffle into ONE reduce task and the two variants time equal (verified
# via .explain: AQEShuffleRead "coalesced"). With coalescing off and the
# fact side replicated 16x — the at-scale shape — the hot task reads
# 9.24x the median rows and runs 2.77x the median time; salting levels
# it to 1.42x/1.05x (SCALE.md rule 7 for the full numbers, including why
# AQE's skew splitter cannot fire on this plan).

_SKEW_SALT = 16
_SKEW_CASE = "CASE WHEN l_orderkey % 5 = 0 THEN -1 ELSE l_suppkey END"

_SKEW_JOIN_ORACLE = f"""
WITH li AS (
  SELECT {_SKEW_CASE} AS skew_key, l_extendedprice, l_discount
  FROM lineitem
),
dim AS (
  SELECT s_suppkey AS skew_key, s_nationkey FROM supplier
  UNION ALL SELECT -1, -1
)
SELECT li.skew_key, d.s_nationkey,
       count(*) AS n_items,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM li JOIN dim d USING (skew_key)
GROUP BY 1, 2
"""


def _skewed_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return li.withColumn(
        "skew_key",
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(-1)).otherwise(
            F.col("l_suppkey")
        ),
    )


def _skew_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("skew_key"), "s_nationkey"
    )
    hot = spark.range(1).select(
        F.lit(-1).cast("bigint").alias("skew_key"),
        F.lit(-1).cast("bigint").alias("s_nationkey"),
    )
    return sup.unionByName(hot)


def _skew_revenue_agg(joined: DataFrame) -> DataFrame:
    return joined.groupBy("skew_key", "s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


@query(
    "skewed_join_revenue_unsalted",
    oracle=_SKEW_JOIN_ORACLE,
    doc="The skew BASELINE: lineitem with a planted hot key (-1 owns every "
    "5th row) sort-merge-joined to the supplier dim (merge hint — the "
    "forced-SMJ stands in for a dim too big to broadcast). The hot key "
    "hashes to ONE shuffle partition, so one task sorts+probes ~20% of "
    "the fact side while its 31 peers split the rest. Benched against "
    "the salted twin below; identical oracle.",
    bench=True,
)
def skewed_join_revenue_unsalted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _skewed_lineitems(spark, sf_dir)
    dim = _skew_dim(spark, sf_dir)
    return _skew_revenue_agg(li.join(dim.hint("merge"), "skew_key"))


@query(
    "skewed_join_revenue_salted",
    oracle=_SKEW_JOIN_ORACLE,
    doc=f"The skew FIX: fact side gets salt = l_orderkey % {_SKEW_SALT}, "
    "the dim side explodes each row into all "
    f"{_SKEW_SALT} salts, and the join key becomes (skew_key, salt) — the "
    f"hot key's rows spread over {_SKEW_SALT} tasks at the cost of "
    f"replicating the (small) dim x{_SKEW_SALT}. Same merge-hinted SMJ, "
    "same oracle as the unsalted twin; the bench delta between the two "
    "entries is the measured price of one 20% hot key.",
    bench=True,
)
def skewed_join_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _skewed_lineitems(spark, sf_dir).withColumn(
        "salt", (F.col("l_orderkey") % _SKEW_SALT).cast("int")
    )
    dim = _skew_dim(spark, sf_dir).withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SKEW_SALT)]))
    )
    return _skew_revenue_agg(li.join(dim.hint("merge"), ["skew_key", "salt"]))


@query(
    "doc_array_functions",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id,
       array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_alpha,
       list_contains(toks, 'spark') AS has_spark,
       list_reverse(toks)[1] AS last_token,
       CAST(len(list_filter(toks, t -> len(t) > 5)) AS INT) AS n_long_tokens
FROM toks
""",
    doc="Array scalar surface: sort/distinct/slice/contains/reverse/"
    "element/lambda-filter over token arrays — all codegen'd per-row "
    "expressions, zero shuffle. Array outputs serialize to strings for "
    "the cross-engine compare (both sort strings in binary collation).",
)
def doc_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.text.analysis import tokens

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_alpha"
        ),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(F.reverse(toks), 1).alias("last_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
    )


@query(
    "grouping_sets_revenue",
    oracle=f"""
SELECT r_name, o_orderpriority,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (o_orderpriority), ())
""",
    doc="Explicit GROUPING SETS (beyond rollup/cube) with GROUPING() "
    "markers, via the SQL surface on both engines — one Expand + "
    "HashAggregate pass, not three scans.",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_price,
               CAST(GROUPING(r_name) AS INT) AS g_region,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (o_orderpriority), ())
        """
    )


@query(
    "unpivot_order_totals",
    oracle=f"""
WITH pivoted AS (
  SELECT o_orderpriority,
         {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_total,
         {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS filled_total
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'open_total' AS status_kind, open_total AS total
FROM pivoted
UNION ALL
SELECT o_orderpriority, 'filled_total' AS status_kind, filled_total AS total
FROM pivoted
""",
    doc="Unpivot (wide->long) via stack() over the conditional-agg pivot — "
    "a Generate, no extra shuffle beyond the pivot's own agg.",
)
def unpivot_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def status_total(status: str) -> F.Column:
        return F.sum(
            F.when(
                F.col("o_orderstatus") == status,
                F.col("o_totalprice").cast("decimal(18,6)"),
            )
        ).cast("double")

    pivoted = orders.groupBy("o_orderpriority").agg(
        status_total("O").alias("open_total"),
        status_total("F").alias("filled_total"),
    )
    return pivoted.select(
        "o_orderpriority",
        F.expr(
            "stack(2, 'open_total', open_total, 'filled_total', filled_total) "
            "AS (status_kind, total)"
        ),
    )


@query(
    "customer_order_window_frames",
    oracle=f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS od,
         o_totalprice
  FROM orders
)
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY od
                  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS spend_7d,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_order,
       nth_value(o_orderkey, 2)
         OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_order,
       ntile(4) OVER w AS quartile
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)
""",
    doc="Window FRAME specs + navigation: RANGE frame over epoch seconds "
    "(7-day trailing spend — peers at equal dates all included), "
    "first/last/nth_value with explicit full frames, ntile. One shuffle on "
    "o_custkey serves every window (shared partitioning).",
)
def customer_order_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    od = F.unix_timestamp("o_orderdate")
    o = orders.select(
        "o_custkey", "o_orderkey", od.alias("od"), "o_totalprice"
    )
    w_order = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    w_range = (
        Window.partitionBy("o_custkey").orderBy("od").rangeBetween(-604800, 0)
    )
    w_full = w_order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w_range)
        .cast("double")
        .alias("spend_7d"),
        F.first("o_orderkey").over(w_order).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        F.ntile(4).over(w_order).alias("quartile"),
    )


@query(
    "lineitem_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS abs_centered,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       sqrt(l_extendedprice) AS price_sqrt,
       l_extendedprice * l_extendedprice AS price_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
""",
    doc="Math scalar surface restricted to IEEE-exact ops (abs/sign/floor/"
    "ceil/sqrt/mod/greatest/least and explicit squares — no transcendentals, "
    "whose libm implementations differ across engines in the last ulp). "
    "Pure per-row codegen; zero shuffle.",
)
def lineitem_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_centered"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


_PCT_ACCURACY = 10000  # approx_percentile rank error <= n / accuracy
_PCT_EPS = 0.02  # bracket half-width in rank-fraction terms (200x the bound)
_PCT_MIN_N = 100  # below this the ±eps bracket is narrower than a rank gap


@query(
    "approx_value_percentiles",
    oracle="""
SELECT event_type,
       count(value) AS n_values,
       CAST(1 AS INT) AS median_bracketed,
       CAST(1 AS INT) AS p90_bracketed
FROM events
GROUP BY event_type
""",
    doc="approx_percentile sketches — the 100 TB quantile path (fixed-size "
    "mergeable sketch vs the exact rank-selection in exact_value_quantiles). "
    "The sketch estimate is engine-specific, so the oracle is a BOUNDED "
    "check: the estimate must land between the EXACT percentiles at "
    "p ± 0.02 (Greenwald-Khanna guarantees rank error <= n/accuracy = "
    "n/10000, i.e. ± 0.0001 in rank fraction — the bracket gives a 200x "
    "margin, while a broken sketch still fails). Below ~100 values the "
    "±0.02 bracket spans less than a couple of rank gaps and the "
    "interpolated exact percentiles can exclude the data value the sketch "
    "legitimately returns (ADVICE r5), so groups under _PCT_MIN_N pass "
    "trivially — the check is only claimed where it is meaningful. Exact "
    "counts per group value-compare against DuckDB.",
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    agg = ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.approx_percentile("value", 0.5, _PCT_ACCURACY).alias("approx_median"),
        F.approx_percentile("value", 0.9, _PCT_ACCURACY).alias("approx_p90"),
        F.expr(
            f"percentile(value, array({0.5 - _PCT_EPS}, {0.5 + _PCT_EPS}, "
            f"{0.9 - _PCT_EPS}, {0.9 + _PCT_EPS}))"
        ).alias("brackets"),
    )

    def bracketed(est: str, lo_idx: int, hi_idx: int) -> F.Column:
        # n < _PCT_MIN_N: bracket narrower than one rank gap — vacuously 1.
        return (
            (F.col("n_values") < _PCT_MIN_N)
            | (
                (F.col("brackets")[lo_idx] <= F.col(est))
                & (F.col(est) <= F.col("brackets")[hi_idx])
            )
        ).cast("int")

    return agg.select(
        "event_type",
        "n_values",
        bracketed("approx_median", 0, 1).alias("median_bracketed"),
        bracketed("approx_p90", 2, 3).alias("p90_bracketed"),
    )


@query(
    "null_semantics_orders",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         nullif(o_orderstatus, 'P') AS status_n
  FROM orders
),
ranked AS (
  SELECT o_orderpriority, o_orderkey, status_n,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY status_n ASC NULLS FIRST,
                                     o_orderkey ASC) AS rn
  FROM o
)
SELECT o.o_orderpriority,
       count(*) AS n_total,
       count(o.status_n) AS n_nonnull,
       CAST(sum(CASE WHEN o.status_n IS NOT DISTINCT FROM NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq_null,
       CAST(sum(CASE WHEN coalesce(o.status_n, 'missing') = 'missing'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced,
       max(r.first_key) AS first_key_nulls_first
FROM o
JOIN (SELECT o_orderpriority, o_orderkey AS first_key
      FROM ranked WHERE rn = 1) r USING (o_orderpriority)
GROUP BY o.o_orderpriority
""",
    doc="Null semantics pinned: nullif-constructed nulls, count(col) "
    "skipping nulls, null-safe equality (<=> / IS NOT DISTINCT FROM), "
    "coalesce, and explicit NULLS FIRST ordering (Spark's ASC default is "
    "nulls-first, DuckDB's is nulls-last — the explicit spec makes both "
    "engines agree; the rank-1 key per group proves it).",
)
def null_semantics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_n"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("status_n").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    first = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderkey").alias("first_key"))
    )
    return (
        o.join(F.broadcast(first), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("status_n").alias("n_nonnull"),
            F.sum(
                F.when(F.col("status_n").eqNullSafe(F.lit(None).cast("string")), 1)
                .otherwise(0)
            ).alias("n_null_safe_eq_null"),
            F.sum(
                F.when(F.coalesce("status_n", F.lit("missing")) == "missing", 1)
                .otherwise(0)
            ).alias("n_coalesced"),
            F.max("first_key").alias("first_key_nulls_first"),
        )
    )


@query(
    "event_values_winsorized",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                  THEN value END) AS lo,
         max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                  THEN value END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_events,
       any_value(b.lo) AS p05,
       any_value(b.hi) AS p95,
       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_low,
       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_high,
       {dsum_sql('least(greatest(e.value, b.lo), b.hi)')}
         AS winsorized_sum
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
""",
    doc="Winsorization — outlier clamping at exact per-group P05/P95, the "
    "feature-preprocessing step that keeps heavy-tailed metrics from "
    "dominating training: bounds come from the rank-selection exact "
    "quantile idiom (deterministic under ties, engine-portable — see "
    "exact_value_quantiles), clamping is least/greatest against the "
    "broadcast #groups-row bounds table, and the clamped sum runs "
    "through the exact-decimal path. Output audits the clamp itself "
    "(how many rows hit each bound) — the number a pipeline monitors "
    "to notice a distribution shifting into its clamps. Two shuffles "
    "at any scale: the rank window and the final group-by; at 100 TB "
    "swap rank selection for approx_percentile bounds with the same "
    "clamp plan.",
)
def event_values_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.05 * F.col("n")), F.col("value"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("value"))
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.any_value("lo").alias("p05"),
            F.any_value("hi").alias("p95"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamped_high"),
            dsum(clamped).alias("winsorized_sum"),
        )
    )


@query(
    "event_interarrival_p99",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
),
ranked AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY gap_us ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM gaps WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(any_value(n) AS BIGINT) AS n_gaps,
       CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN gap_us END) AS BIGINT) AS p50_gap_us,
       CAST(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                     THEN gap_us END) AS BIGINT) AS p99_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM ranked GROUP BY event_type
""",
    doc="Inter-arrival SLA monitor: exact p50/p99/max of the per-type gap "
    "between consecutive events — the freshness alarm (a p99 gap "
    "blowing out means a producer stalled) with rank-selection exact "
    "quantiles (deterministic under ties; gap ties are common at "
    "regular cadences, where interpolating percentiles diverge between "
    "engines). Microsecond-integer gaps end to end. Two windows, both "
    "partitioned by the bounded event_type key: the lag pass and the "
    "rank pass — at 100 TB consider pre-bucketing per type per hour "
    "and monitoring bucket maxima instead of global ranks.",
)
def event_interarrival_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # fixture ts may read as TIMESTAMP_NTZ (micros generation); session tz
    # is UTC so the cast is wall-clock-preserving and unix_micros resolves
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "event_type", (ts_us - F.lag(ts_us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    w_rank = Window.partitionBy("event_type").orderBy(F.col("gap_us").asc())
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.any_value("n").cast("bigint").alias("n_gaps"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("gap_us"))
        )
        .cast("bigint")
        .alias("p50_gap_us"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.99 * F.col("n")), F.col("gap_us"))
        )
        .cast("bigint")
        .alias("p99_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@query(
    "user_event_type_map_profile",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
filtered AS (SELECT * FROM counts WHERE n >= 2)
SELECT user_id,
       string_agg(event_type || '=' || n, ',' ORDER BY event_type)
         AS profile,
       count(*) AS n_types,
       CAST(sum(n) AS BIGINT) AS n_events
FROM filtered GROUP BY 1
""",
    doc="MAP higher-order functions exercised end to end (the map half of "
    "the collection-function surface; the array half is covered by the "
    "zip_with/aggregate/transform vector calculus everywhere): per-user "
    "event-type counts build a real MapType via map_from_entries, "
    "map_filter drops rare types (v >= 2), and the canonical output "
    "string renders via array_sort(map_keys) + transform + element_at + "
    "array_join — all JVM-side codegen'd expressions, no UDF. Maps "
    "can't cross the oracle boundary (canonical row-sort), so the "
    "CONTRACT output is the sorted 'type=n' string + sizes, which the "
    "oracle rebuilds with ordered string_agg. One shuffle pair "
    "(user,type) -> user, both partial-aggregated.",
)
def user_event_type_map_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_user = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    filtered = per_user.withColumn(
        "fm", F.map_filter("m", lambda k, v: v >= 2)
    ).where(F.size("fm") > 0)
    profile = F.array_join(
        F.transform(
            F.array_sort(F.map_keys("fm")),
            lambda k: F.concat(
                k, F.lit("="), F.element_at(F.col("fm"), k).cast("string")
            ),
        ),
        ",",
    )
    return filtered.select(
        "user_id",
        profile.alias("profile"),
        F.size("fm").cast("bigint").alias("n_types"),
        F.expr(
            "aggregate(map_values(fm), 0L, (acc, x) -> acc + x)"
        ).alias("n_events"),
    )


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Reusable interval-containment join (point in [start, end)) WITHOUT
    an equi key, rewritten as an equi hash join on bin id.

    Intervals explode onto the (end-start)/bin_width + 1 bins they cover;
    each point computes its single bin with integer DIV (non-negative
    domain, e.g. epoch seconds); the residual range filter completes the
    match. Every (point, interval) pair meets in exactly one bin — the
    point's — so no post-join dedup (property-tested in
    tests/test_properties.py::test_interval_binning_matches_brute_force).
    Pick bin_width ~ the median interval length to keep interval fan-out
    <= 2. Set broadcast_intervals=False for a large interval set: the
    same plan shuffles both sides on bin_id instead.

    Precondition: end > start. An empty/inverted interval would make
    F.sequence generate a DESCENDING bin list — exploding the interval
    onto bins it does not cover and breaking the one-bin-per-pair
    invariant — so such rows are filtered out up front (they can match
    no point under [start, end) anyway).
    """
    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    bins = intervals.withColumn(
        "bin_id",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {bin_width}"),
                F.expr(f"({end_col} - 1) DIV {bin_width}"),
            )
        ),
    )
    if broadcast_intervals:
        bins = F.broadcast(bins)
    pts = points.withColumn("bin_id", F.expr(f"{point_col} DIV {bin_width}"))
    return pts.join(bins, "bin_id").where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )



@query(
    "events_interval_burst_stats",
    oracle=f"""
WITH seeds AS (
  SELECT event_id AS window_id,
         CAST(floor(epoch(ts)) AS BIGINT) - 1800 AS start_sec,
         CAST(floor(epoch(ts)) AS BIGINT) + 5400 AS end_sec
  FROM events
  ORDER BY value DESC, event_id ASC
  LIMIT 48
),
pts AS (
  SELECT event_id, user_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS e_sec
  FROM events
)
SELECT s.window_id,
       count(*) AS n_events,
       count(DISTINCT p.user_id) AS n_users,
       {dsum_sql('p.value')} AS sum_value,
       min(p.event_id) AS first_event,
       max(p.event_id) AS last_event
FROM pts p JOIN seeds s
  ON p.e_sec >= s.start_sec AND p.e_sec < s.end_sec
GROUP BY s.window_id
""",
    doc="Interval-containment join WITHOUT an equi key — the classic case "
    "where naive Spark falls back to BroadcastNestedLoopJoin (O(n x m) "
    "compares; at 100 TB with a large interval set, unrunnable). The "
    "48 highest-value events each open a [ts-30min, ts+90min) burst "
    "window (TakeOrdered seed selection, never a global sort) and every "
    "event is matched to every window containing it by BINNING: windows "
    "explode onto the 1-hour bins they cover (<= 3 rows each), points "
    "compute their single bin with integer DIV, and the match becomes an "
    "EQUI-join on bin_id + a residual range filter — each (event, window) "
    "pair meets in exactly one bin (the event's), so no post-join dedup. "
    "DuckDB's native IEJoin runs the same inequality join as the oracle. "
    "Scale: bin fan-out is len/bin_width + 1 per interval, the join is a "
    "plain hash join keyed by bin_id (broadcast here because 48 windows; "
    "drop the hint and it shuffles both sides on bin_id for a large "
    "interval set), and skew is bounded by events-per-hour. Plan pin: "
    "tests/test_plan_shapes.py asserts the naive inequality formulation "
    "produces a BroadcastNestedLoopJoin while this one has none.",
    bench=True,
)
def events_interval_burst_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("e_sec"),
    )
    seeds = (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(48)
        .select(
            F.col("event_id").alias("window_id"),
            (F.col("e_sec") - 1800).alias("start_sec"),
            (F.col("e_sec") + 5400).alias("end_sec"),
        )
    )
    joined = bin_interval_join(
        ev, seeds, "e_sec", "start_sec", "end_sec", bin_width=3600
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )
