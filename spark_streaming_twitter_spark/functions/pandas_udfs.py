"""The complete Python-UDF escape-hatch surface, one oracle-checked example
each. With these four plus ``applyInPandasWithState`` (streaming/queries)
and ``mapInPandas`` (multimodal/columns), every Arrow-batched Python entry
point Spark offers is exercised and verified against SQL:

- scalar ``@pandas_udf``       — vectorized column function (Series->Series)
- ``applyInPandas``            — grouped-map (one pandas frame per group)
- ``cogroup().applyInPandas``  — co-grouped map (two frames per key)
- ``mapInArrow``               — lowest level: raw pyarrow RecordBatches

Row-at-a-time ``F.udf`` is deliberately ABSENT from this codebase — the
per-row Python crossing is the one shape that can never be made fast.

Each example computes something deterministic (counts, ranks, histograms)
so the DuckDB oracle compares exactly; float statistics (mean/std) stay out
of Python on purpose (order-dependent reductions belong to the engine's
exact-decimal path, functions/numeric.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spark_streaming_twitter_spark.catalog import table, widen
from spark_streaming_twitter_spark.registry import query


def ws_token_count():
    """Whitespace token count as a scalar pandas UDF (Series -> Series).

    Built lazily: @pandas_udf parses its DDL return type against the active
    session, so the decorator can't run at import time.
    """

    @pandas_udf("int")
    def _count(text: pd.Series) -> pd.Series:
        return text.str.split().str.len().fillna(0).astype("int32")

    return _count


@query(
    "pandas_udf_token_counts",
    oracle=r"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
            AS INT) AS n_tokens
FROM documents
""",
    doc="Scalar @pandas_udf: Series-in/Series-out over Arrow batches "
    "(pandas str.split vectorization). Same answer as the pure-expression "
    "doc_token_stats path — the oracle proves the Python and JVM "
    "tokenizers agree. Use the expression form in hot paths; this is the "
    "template for logic that genuinely needs a Python library.",
)
def pandas_udf_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    return docs.select("doc_id", ws_token_count()(F.col("text")).alias("n_tokens"))


@query(
    "applyinpandas_source_ranks",
    oracle="""
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id ASC) AS INT)
         AS rank_in_source
FROM documents
""",
    doc="applyInPandas grouped-map: each source's docs arrive as ONE pandas "
    "frame (shuffle on the group key), ranked locally with a deterministic "
    "sort. Equivalent to a window row_number (the oracle) — use the window "
    "in SQL-expressible cases; this is the template for per-group Python "
    "(model scoring, per-group fitting). Group = unit of memory: a group "
    "must fit in one executor's heap, so key choice is the scale lever.",
)
def applyinpandas_source_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        pdf["rank_in_source"] = range(1, len(pdf) + 1)
        return pdf[["doc_id", "source", "rank_in_source"]]

    return docs.groupBy("source").applyInPandas(
        rank_group, "doc_id long, source string, rank_in_source int"
    )


@query(
    "cogrouped_purchase_latency",
    oracle="""
WITH s AS (SELECT DISTINCT user_id, ts FROM events
           WHERE event_type = 'signup'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT s.user_id,
       CAST(floor(epoch(s.ts)) AS BIGINT) AS signup_epoch,
       CAST(floor(epoch(min(p.ts))) AS BIGINT) AS first_purchase_epoch,
       CAST(floor(epoch(min(p.ts))) - floor(epoch(s.ts)) AS BIGINT)
         AS latency_secs
FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.ts >= s.ts
GROUP BY s.user_id, s.ts
""",
    doc="cogroup().applyInPandas co-grouped map: each user's signups AND "
    "purchases arrive as TWO pandas frames in one Python call (both sides "
    "shuffle on the key, one Arrow transfer each). The kernel is a "
    "vectorized searchsorted as-of match — first purchase at or after "
    "each signup — the template for per-key two-table Python logic "
    "(custom as-of rules, per-entity reconciliation) when the join "
    "condition outgrows SQL. SQL-expressible here by design, so the "
    "oracle (LEFT JOIN + min) proves the co-grouping exact, including "
    "keys present on only one side. Both sides take DISTINCT (user_id, ts) "
    "signups — the oracle's GROUP BY s.user_id, s.ts would collapse "
    "duplicate signup timestamps the kernel emits per-event (ADVICE r5), "
    "so the dedup is explicit and shared. Same memory contract as "
    "grouped-map: one KEY's two frames must fit an executor's heap.",
)
def cogrouped_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    signups = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", "ts")
        .distinct()
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )

    def first_purchase(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if left.empty:  # purchases-only user: no output rows
            return pd.DataFrame(
                columns=[
                    "user_id",
                    "signup_epoch",
                    "first_purchase_epoch",
                    "latency_secs",
                ]
            )
        s_us = left["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        p_us = np.sort(
            right["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        idx = np.searchsorted(p_us, s_us, side="left")
        signup_epoch = s_us // 1_000_000
        first_epoch = [
            int(p_us[i]) // 1_000_000 if i < len(p_us) else None for i in idx
        ]
        return pd.DataFrame(
            {
                "user_id": left["user_id"].to_numpy(),
                "signup_epoch": signup_epoch,
                "first_purchase_epoch": pd.array(first_epoch, dtype="Int64"),
                "latency_secs": pd.array(
                    [
                        fp - se if fp is not None else None
                        for fp, se in zip(first_epoch, signup_epoch)
                    ],
                    dtype="Int64",
                ),
            }
        )

    return (
        signups.groupby("user_id")
        .cogroup(purchases.groupby("user_id"))
        .applyInPandas(
            first_purchase,
            "user_id long, signup_epoch long, first_purchase_epoch long, "
            "latency_secs long",
        )
    )


@query(
    "mapinarrow_byte_histograms",
    oracle=f"""
WITH bytes AS (
  SELECT doc_id AS media_id,
         ord(unnest(string_split(text, ''))) // 16 AS bucket,
         len(text) AS n
  FROM documents
)
SELECT media_id, CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS DOUBLE) / any_value(n) AS frac
FROM bytes
GROUP BY media_id, bucket
""",
    doc="mapInArrow: the lowest-level Arrow entry point — raw RecordBatches "
    "in and out, no pandas materialization (half the peak memory of "
    "mapInPandas for binary-heavy batches). Same byte-histogram semantics "
    "and ORACLE as media_byte_histograms, so the two API levels are "
    "proven equivalent.",
)
def mapinarrow_byte_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from spark_streaming_twitter_spark.multimodal.columns import media_table

    media = media_table(spark, sf_dir).select("media_id", "payload")

    def hist(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out_id, out_bucket, out_frac = [], [], []
            for mid, payload in zip(ids, payloads):
                b = np.frombuffer(payload, dtype=np.uint8)
                if len(b) == 0:
                    continue
                counts = np.bincount(b >> 4, minlength=16)
                for bucket in np.nonzero(counts)[0]:
                    out_id.append(mid)
                    out_bucket.append(int(bucket))
                    out_frac.append(float(counts[bucket]) / len(b))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_bucket, type=pa.int32()),
                    pa.array(out_frac, type=pa.float64()),
                ],
                names=["media_id", "bucket", "frac"],
            )

    return media.mapInArrow(hist, "media_id long, bucket int, frac double")


@query(
    "applyinarrow_type_quantiles",
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(round(CAST(value AS DOUBLE) * 1048576.0) AS BIGINT) AS v
  FROM events
),
r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM s
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rk = (n - 1) // 2 THEN v END) AS p50_scaled,
       max(CASE WHEN rk = ((n - 1) * 9) // 10 THEN v END) AS p90_scaled
FROM r GROUP BY 1
""",
    doc="GroupedData.applyInArrow (Spark 4) — the zero-pandas grouped "
    "entry point, completing the Arrow family (pandas_udf / "
    "applyInPandas / cogroup / mapInArrow / UDTF): each event_type "
    "group arrives as ONE pyarrow.Table and exact lower-rank quantiles "
    "(index floor((n-1)q) of the ascending sort) come straight from "
    "pyarrow.compute sort+take — no pandas materialization, no numpy "
    "copy, the cheapest possible Python hop for columnar per-group "
    "logic. Values pre-scaled to BIGINT (round(v * 2^20)) so the "
    "selected elements are integers and the oracle's row_number replay "
    "matches bitwise. Plan: one shuffle on the 5-value group key; at "
    "100 TB per-group data must fit one task (the applyInPandas "
    "contract) — for heavy-tailed keys use the two-stage "
    "approx_value_percentiles instead; this entry is the EXACT "
    "small-group tier.",
)
def applyinarrow_type_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value").cast("double") * F.lit(1048576.0))
        .cast("bigint")
        .alias("v"),
    )

    def quantiles(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        v = pc.sort_indices(t.column("v"))
        sv = pc.take(t.column("v"), v)
        n = len(sv)
        p50 = sv[(n - 1) // 2].as_py()
        p90 = sv[((n - 1) * 9) // 10].as_py()
        return pa.table(
            {
                "event_type": [t.column("event_type")[0].as_py()],
                "n": pa.array([n], pa.int64()),
                "p50_scaled": pa.array([p50], pa.int64()),
                "p90_scaled": pa.array([p90], pa.int64()),
            }
        )

    return ev.groupBy("event_type").applyInArrow(
        quantiles,
        schema="event_type string, n bigint, p50_scaled bigint, "
        "p90_scaled bigint",
    )
