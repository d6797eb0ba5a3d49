"""Modern Spark 4 API surface: VARIANT, SQL pipe syntax, Python UDTF.

Three engine capabilities newer than anything the reference uses
(its JSON path is a Jackson POJO map, Tweet.java:10-21; its flatMap is a
typed Java lambda, TwitterDStreamTrendingHashtag.java:60-78), each proven
with an oracle-checked query:

- VARIANT (``parse_json`` / ``variant_get``): the open-schema
  semi-structured path — binary-encoded, shreddable, no schema declared
  up front. At 100 TB this replaces per-row JSON string parsing with a
  decode-once binary column.
- SQL pipe syntax (``FROM t |> WHERE ... |> AGGREGATE``): the
  composable SQL form added in Spark 4.0 — same Catalyst plan as the
  equivalent SELECT, purely a text-surface capability proof.
- Python UDTF (``@udtf`` + ``LATERAL``): the user-extensible table
  function. Deliberately NOT the production path for tokenization — the
  codegen'd ``regexp_extract_all``/``split`` pipeline is (SCALE.md rule
  1); this query exists to prove the extension point works end-to-end
  with correct lateral-join semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table
from spark_streaming_twitter_spark.functions.numeric import dsum_sql
from spark_streaming_twitter_spark.registry import query


@query(
    "event_props_variant",
    oracle="""
SELECT event_type,
       CAST(CAST(props->>'k' AS BIGINT) // 10 AS BIGINT) AS k_decade,
       count(*) AS n,
       max(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY 1, 2
""",
    doc="VARIANT semi-structured path: props parsed once with parse_json "
    "into Spark's binary VARIANT encoding, fields extracted with "
    "variant_get — the Spark 4 replacement for repeated string-path "
    "get_json_object (event_props_stats keeps the classic form). "
    "Decade-bucketed counts per event type; one shuffle on the "
    "(type, decade) agg key.",
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "props")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.expr("k DIV 10").alias("k_decade"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("k").alias("max_k"))
    )


@query(
    "pipe_sql_returnflag_revenue",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1, 2
""",
    doc="SQL pipe syntax (Spark 4.0 '|>' operators): the pricing-summary "
    "shape written as FROM |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY. "
    "Compiles to the identical Catalyst plan as the SELECT form — "
    "pushdown, partial aggregation, and the DECIMAL(18,6) exact-sum "
    "trick all apply unchanged; this query pins the text surface.",
)
def pipe_sql_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
FROM lineitem_pipe
|> WHERE l_shipdate <= DATE '1998-09-02'
|> EXTEND l_extendedprice * (1 - l_discount) AS rev
|> AGGREGATE count(*) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS revenue
   GROUP BY l_returnflag, l_linestatus
"""
    ).select("l_returnflag", "l_linestatus", "n", "revenue")


@query(
    "udtf_token_positions",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS l
  FROM documents
  WHERE doc_id % 10 = 0
)
SELECT doc_id,
       unnest(generate_series(1, len(l))) AS pos,
       unnest(l) AS token
FROM toks
""",
    doc="Python UDTF (@udtf + LATERAL join): whitespace tokenizer emitting "
    "(pos, token) rows per document — the reference's flatMap shape "
    "(TwitterDStreamTrendingHashtag.java:60-78) as a user-defined table "
    "function. Row-at-a-time Python is the SLOW path by design (SCALE.md "
    "rule 1): this is the extension-point capability proof, restricted "
    "to a 1-in-10 document sample; production tokenization stays on the "
    "codegen'd split/regexp pipeline (doc_token_stats et al).",
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    import re

    # ASCII whitespace ONLY, matching RE2's '\s' in the DuckDB oracle —
    # Python str.split() is Unicode-aware (U+00A0, thin spaces, NEL) and
    # would tokenize scraped web text differently from the oracle. NO \v:
    # RE2's \s is exactly [\t\n\f\r ] — a vertical tab must stay inside a
    # token on both engines (ADVICE r2).
    ascii_ws = re.compile(r"[ \t\n\r\f]+")

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                return
            toks = [t for t in ascii_ws.split(text) if t != ""]
            for i, tok in enumerate(toks):
                yield i + 1, tok

    spark.udtf.register("split_tokens_udtf", SplitTokens)
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    docs.select("doc_id", "text").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
SELECT d.doc_id, t.pos, t.token
FROM docs_udtf d, LATERAL split_tokens_udtf(d.text) t
"""
    )


@query(
    "ps_orders_priority_stats",
    oracle="""
SELECT o_orderpriority,
       count(o_orderkey) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders GROUP BY 1
""",
    doc="pandas API on Spark (pyspark.pandas): the dataframe-migration "
    "surface — read_parquet / assign / groupby-agg in pandas idiom, "
    "compiled to the SAME Catalyst plan as the native DataFrame form, "
    "then handed back via to_spark(). Money is summed as integer CENTS "
    "(round(x*100) per row, int64 sum) so the result is exact and "
    "engine-portable where a float sum would be order-dependent. Proves "
    "the pandas-API entry point end-to-end against the SQL oracle.",
)
def ps_orders_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")[
            ["o_orderpriority", "o_orderkey", "o_totalprice"]
        ]
        psdf = psdf.assign(
            cents=(psdf["o_totalprice"] * 100).round(0).astype("int64")
        )
        out = (
            psdf.groupby("o_orderpriority", as_index=False)
            .agg(n_orders=("o_orderkey", "count"), total_cents=("cents", "sum"))
            .to_spark()
        )
    return out


@query(
    "sql_udf_discounted_revenue",
    oracle=f"""
SELECT l_returnflag, count(*) AS n,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
GROUP BY 1
""",
    doc="SQL-language UDF (Spark 4 CREATE FUNCTION ... RETURN expr): the "
    "discounted-revenue formula is defined ONCE as a named function and "
    "reused by name — and unlike a Python UDF, Catalyst INLINES the body "
    "into the plan (no serialization wall, pushdown and codegen see "
    "through it; test_sql_udf_inlines_no_python pins the absence of any "
    "Python eval node). This is the right way to share business logic "
    "across queries at 100 TB: a function catalog of SQL bodies, zero "
    "runtime cost over writing the expression inline. Revenue sums "
    "through the DECIMAL(18,6) exact-aggregation convention.",
)
def sql_udf_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sqludf")
    return spark.sql(
        """
SELECT l_returnflag, count(*) AS n,
       CAST(SUM(CAST(disc_rev(l_extendedprice, l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem_sqludf
GROUP BY 1
"""
    )


@query(
    "sql_table_function_big_orders",
    oracle="""
SELECT o_orderpriority, count(*) AS n,
       CAST(max(o_totalprice * 100) AS BIGINT) AS max_cents
FROM orders
WHERE o_totalprice >= 45000
GROUP BY 1
""",
    doc="SQL-language TABLE function (CREATE FUNCTION ... RETURNS TABLE "
    "... RETURN SELECT): a parameterized relation — orders above a price "
    "floor — invoked in the FROM clause like a view with arguments. The "
    "body inlines into the plan, so the o_totalprice predicate reaches "
    "the parquet scan exactly as if written inline (pushdown through the "
    "function boundary). max(o_totalprice*100) compares as exact integer "
    "cents. The table-function surface complements the Python UDTF leg "
    "(udtf_token_positions): same API shape, but this one is pure "
    "Catalyst with no Python process.",
)
def sql_table_function_big_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sqltf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION big_orders(floor_price DOUBLE) "
        "RETURNS TABLE(o_orderpriority STRING, o_totalprice DOUBLE) "
        "RETURN SELECT o_orderpriority, o_totalprice FROM orders_sqltf "
        "WHERE o_totalprice >= floor_price"
    )
    return spark.sql(
        """
SELECT o_orderpriority, count(*) AS n,
       CAST(max(o_totalprice * 100) AS BIGINT) AS max_cents
FROM big_orders(45000.0)
GROUP BY 1
"""
    )


@query(
    "ansi_try_arithmetic_audit",
    oracle="""
WITH e AS (
  SELECT event_type, value,
         CAST(floor(value * 10) AS BIGINT) % 7 AS div7
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN div7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_div,
       CAST(SUM(CAST(CASE WHEN div7 = 0 THEN 0.0
                          ELSE value / div7 END AS DECIMAL(18,6)))
            AS DOUBLE) AS safe_sum
FROM e GROUP BY 1
""",
    doc="ANSI-mode error-safe arithmetic (Spark 4 runs ANSI by default, "
    "where x/0 THROWS): try_divide yields NULL instead, which is the "
    "production contract for a 100 TB scan — one malformed row must "
    "degrade to NULL, not kill the stage (the numeric sibling of the "
    "PERMISSIVE JSON and corrupt-record-quarantine legs). The audit "
    "plants a zero divisor on every 7th value bucket, counts the rows "
    "try_divide nulled, and folds the survivors through the exact "
    "DECIMAL sum; the oracle replays with an explicit CASE — NULL "
    "production, not error suppression, is what's being pinned. "
    "Per-row expressions + one map-side-combinable groupBy.",
)
def ansi_try_arithmetic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    div7 = (F.floor(F.col("value") * 10).cast("bigint") % 7).alias("div7")
    e = ev.select("event_type", "value", div7)
    safe = F.try_divide(F.col("value"), F.col("div7"))
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(safe.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_div"),
        F.sum(F.coalesce(safe, F.lit(0.0)).cast("decimal(18,6)"))
        .cast("double")
        .alias("safe_sum"),
    )


@query(
    "supplier_hierarchy_rollup",
    oracle="""
WITH RECURSIVE chain(s_suppkey, anc, depth) AS (
  SELECT s_suppkey, s_suppkey, 0 FROM supplier
  UNION ALL
  SELECT s_suppkey, anc // 4, depth + 1 FROM chain WHERE anc > 0
)
SELECT s_suppkey, CAST(max(depth) AS INT) AS depth,
       CAST(sum(anc) AS BIGINT) AS path_key_sum
FROM chain GROUP BY s_suppkey
""",
    doc="RECURSIVE SQL (Spark 4.1 WITH RECURSIVE — the surface that "
    "previously forced iterative DataFrame loops like pagerank's "
    "unrolled joins): ancestor-chain traversal over a deterministic "
    "supplier hierarchy (parent(k) = k DIV 4, the org-chart/BOM/category "
    "-tree workload class), emitting each node's depth and the sum of "
    "keys on its root path. The recursion contracts by 4x per step — "
    "O(log n) iterations, each a filter+project over the frontier, with "
    "the engine handling fixpoint detection (contrast the hand-rolled "
    "convergence loop in dedup_group_ids_star). The oracle is the SAME "
    "recursive CTE in DuckDB (// for DIV) — the two engines execute the "
    "identical declarative recursion.",
)
def supplier_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_rec")
    return spark.sql(
        """
WITH RECURSIVE chain(s_suppkey, anc, depth) AS (
  SELECT s_suppkey, s_suppkey, 0 FROM supplier_rec
  UNION ALL
  SELECT s_suppkey, anc DIV 4, depth + 1 FROM chain WHERE anc > 0
)
SELECT s_suppkey, CAST(max(depth) AS INT) AS depth,
       CAST(sum(anc) AS BIGINT) AS path_key_sum
FROM chain GROUP BY s_suppkey
"""
    )


@query(
    "collation_word_forms",
    oracle=r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                            t -> t <> '')) AS tok
  FROM documents
)
SELECT count(*) AS n_tokens,
       count(DISTINCT tok) AS n_forms_cs,
       count(DISTINCT lower(tok)) AS n_forms_ci
FROM toks
""",
    doc="Collated strings (Spark 4 COLLATE): counting distinct word forms "
    "under UNICODE_CI makes case-insensitivity a PROPERTY OF THE TYPE — "
    "the comparator, hash, and therefore the distinct-aggregate's "
    "shuffle key all become case-insensitive with no lower() rewriting "
    "(and unlike lower(), collation survives into joins, group-bys, and "
    "sorts wherever the column flows). The fixture's sentence-case text "
    "makes the CS/CI gap real. Oracle caveat, documented: for this "
    "ASCII corpus UNICODE_CI equivalence classes coincide with lower() "
    "classes, which is what DuckDB replays; the full-Unicode cases "
    "(dotted I, sharp s) where they diverge are exactly why the engine "
    "feature exists.",
)
def collation_word_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.text.analysis import tokens

    docs = table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return toks.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.col("tok")).alias("n_forms_cs"),
        F.count_distinct(
            F.collate(F.col("tok"), "UNICODE_CI")
        ).alias("n_forms_ci"),
    )


@query(
    "observed_orders_metrics",
    oracle=f"""
SELECT count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_finished,
       CAST(floor(epoch(max(o_orderdate))) AS BIGINT) AS max_orderdate_epoch
FROM orders
""",
    doc="`Dataset.observe` — pipeline observability with ZERO extra scan: "
    "the metrics (row count, exact-decimal revenue total, status tally, "
    "max event date) ride the SAME physical scan as the downstream "
    "aggregate (CollectMetricsExec accumulates on the executors while "
    "rows flow through), where a naive health check would re-read the "
    "table. The query runs a real downstream consumer (a per-status "
    "count — collected, it is <=3 rows), then surfaces the observed "
    "metrics as the result row via Observation.get. At 100 TB this is "
    "THE pattern for data-quality gates on ingest: counts/sums/nulls "
    "audited on the one pass the pipeline already pays for. The oracle "
    "recomputes the same aggregates declaratively.",
)
def observed_orders_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    orders = table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_price"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_finished"),
        F.unix_timestamp(F.max("o_orderdate")).alias("max_orderdate_epoch"),
    )
    # the downstream consumer whose scan the metrics piggyback on
    observed.groupBy("o_orderstatus").count().collect()
    row = obs.get
    return spark.createDataFrame(
        [
            (
                row["n_orders"],
                row["total_price"],
                row["n_finished"],
                row["max_orderdate_epoch"],
            )
        ],
        "n_orders long, total_price double, n_finished long, "
        "max_orderdate_epoch long",
    )


@query(
    "udtf_table_arg_user_sessions",
    oracle="""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
  FROM events WHERE user_id % 20 = 0
),
gaps AS (
  SELECT user_id,
         ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                ORDER BY ts_s, event_id) AS gap
  FROM ev
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(1 + sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_s
FROM gaps GROUP BY user_id
""",
    doc="Python UDTF with a PARTITIONED TABLE ARGUMENT (Spark 4: "
    "f(TABLE(...) PARTITION BY ... ORDER BY ...)) — the user-extensible "
    "per-key sequential processor: Spark shuffles and sorts each "
    "user's rows, the UDTF instance sees them in order (eval per row, "
    "terminate per partition) and emits gap-based session stats — the "
    "same execution contract as applyInPandasWithState's batch twin, "
    "exposed through SQL. Restricted to a 1-in-20 user sample (the "
    "row-at-a-time Python path is the capability proof, not the hot "
    "path — SCALE.md rule 1; the production sessionizers are the "
    "declarative window/session_window queries). The oracle is the "
    "lag-window closed form of the same gap rule, tie-broken on "
    "event_id exactly like the UDTF's ORDER BY.",
)
def udtf_table_arg_user_sessions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id bigint, n_events bigint, n_sessions bigint, "
            "max_gap_s bigint"
        )
    )
    class UserSessionStats:
        def __init__(self) -> None:
            self.user = None
            self.n = 0
            self.sessions = 0
            self.last = None
            self.max_gap = 0

        def eval(self, row):
            self.user = row["user_id"]
            ts = row["ts_s"]
            if self.last is None:
                self.sessions = 1
            else:
                gap = ts - self.last
                if gap > self.max_gap:
                    self.max_gap = gap
                if gap > 1800:
                    self.sessions += 1
            self.last = ts
            self.n += 1

        def terminate(self):
            if self.user is not None:
                yield self.user, self.n, self.sessions, self.max_gap

    spark.udtf.register("user_session_stats_udtf", UserSessionStats)
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") % 20 == 0)
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("ts_s"),
            "event_id",
        )
    )
    ev.createOrReplaceTempView("ev_udtf_sessions")
    return spark.sql(
        """
SELECT * FROM user_session_stats_udtf(
  TABLE(SELECT user_id, ts_s, event_id FROM ev_udtf_sessions)
  PARTITION BY user_id ORDER BY (ts_s, event_id)
)
"""
    )
