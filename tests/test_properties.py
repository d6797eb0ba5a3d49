"""Property-based tests (SURVEY.md §5.4): engine results vs plain-Python
reference implementations on randomized inputs.

Each example round-trips a Spark job, so example counts are kept small;
the properties cover the argmax/dedup/vector cores where randomized inputs
catch tie-break and boundary bugs fixtures can't.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.dedup.dedup import (
    scaled_dot,
    scaled_norm2,
    shingles,
)
from spark_streaming_twitter_spark.operators.trending import trending
from spark_streaming_twitter_spark.text.analysis import tokens

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

TAGS = ["a", "b", "c", "dd", "ee"]


@given(st.lists(st.sampled_from(TAGS), min_size=1, max_size=40))
@_SETTINGS
def test_trending_argmax_matches_python(spark, tags):
    df = spark.createDataFrame([(t,) for t in tags], ["term"]).withColumn(
        "bucket", F.lit(1)
    )
    got = trending(df, ["bucket"]).collect()[0]
    # python reference: max count, min term on ties
    counts: dict[str, int] = {}
    for t in tags:
        counts[t] = counts.get(t, 0) + 1
    best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (got.top_term, got.term_count) == best


@given(
    st.lists(
        st.lists(st.sampled_from(TAGS), min_size=3, max_size=12), min_size=2, max_size=4
    )
)
@_SETTINGS
def test_shingle_sets_match_python(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.sh)
        for r in df.select(
            "doc_id", F.explode(shingles(tokens(F.col("text")), 3)).alias("sh")
        ).collect()
    }
    want = set()
    for i, toks in enumerate(docs):
        if len(toks) >= 3:
            for j in range(len(toks) - 2):
                want.add((i, " ".join(toks[j : j + 3])))
        else:
            want.add((i, " ".join(toks)))
    assert got == want


@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=4,
        max_size=16,
    ),
    st.data(),
)
@_SETTINGS
def test_scaled_dot_matches_numpy(spark, a, data):
    b = data.draw(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=len(a),
            max_size=len(a),
        )
    )
    r = (
        spark.createDataFrame([(a, b)], "va array<float>, vb array<float>")
        .select(
            scaled_dot(F.col("va"), F.col("vb")).alias("dot"),
            scaled_norm2(F.col("va")).alias("na"),
        )
        .collect()[0]
    )
    import numpy as np

    av = np.array(a, dtype=np.float32).astype(np.float64)
    bv = np.array(b, dtype=np.float32).astype(np.float64)
    scale = float(1 << 40)
    assert abs(r.dot / scale - float(av @ bv)) <= len(a) * 0.5 / scale * 2
    assert abs(r.na / scale - float(av @ av)) <= len(a) * 0.5 / scale * 2
    assert math.isfinite(r.dot)


@given(
    st.lists(
        st.integers(min_value=0, max_value=20000), min_size=1, max_size=30
    )
)
@_SETTINGS
def test_sessionization_matches_python(spark, offsets):
    """Gap-based sessionization == a simple sequential-scan reference:
    session boundaries exactly where the sorted per-user gap exceeds 1800s."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, base + dt.timedelta(seconds=off))
        for i, off in enumerate(offsets)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])

    # Reuse the registered query body by monkey-free substitution: the query
    # reads from catalog.table, so replicate its plan inline instead.
    from pyspark.sql import Window

    ev = df.select("user_id", "event_id", F.unix_timestamp("ts").alias("ts_s"))
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    got = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in ev.withColumn(
            "is_new", (gap.isNull() | (gap > 1800)).cast("bigint")
        )
        .withColumn("session_seq", F.sum("is_new").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_s").alias("session_start"),
            F.max("ts_s").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )

    # local-time unix_timestamp: build the reference from the same
    # engine-computed epoch values so the tz convention cancels out.
    ts_sorted = sorted(
        r.ts_s for r in ev.select("ts_s").collect()
    )
    want, cur = [], [ts_sorted[0]]
    for t in ts_sorted[1:]:
        if t - cur[-1] > 1800:
            want.append(cur)
            cur = [t]
        else:
            cur.append(t)
    want.append(cur)
    assert got == sorted((c[0], c[-1], len(c)) for c in want)


def test_pagerank_matches_python_on_star_graph(spark):
    """3 exact-integer PageRank iterations == a pure-Python mirror on a
    star graph (center + 3 leaves), where ranks genuinely diverge."""
    from spark_streaming_twitter_spark.operators.graph import (
        BASE,
        SCALE,
        pagerank,
    )

    und = [(0, 1), (0, 2), (0, 3)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {r.id: r.r for r in pagerank(edges).collect()}

    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ranks = {v: SCALE for v in adj}
    for _ in range(3):
        contrib = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            c = ranks[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += c
        ranks = {v: BASE + (85 * contrib[v]) // 100 for v in adj}
    assert got == ranks
    assert got[0] > got[1] == got[2] == got[3]


def test_kmeans_separates_two_obvious_clusters(spark):
    """_assign/_recompute recover two well-separated clusters from seeds
    inside each blob, and recomputed centroids are the exact floor-means."""
    from spark_streaming_twitter_spark.similarity.kmeans import (
        _assign,
        _recompute,
    )

    blob_a = [[10 + i, 10] for i in range(3)]  # around (11, 10)
    blob_b = [[-10 - i, -10] for i in range(3)]
    rows = [(i, v) for i, v in enumerate(blob_a + blob_b)]
    corpus = spark.createDataFrame(rows, "vec_id long, qv array<bigint>")
    seeds = spark.createDataFrame(
        [(0, blob_a[0]), (1, blob_b[0])], "cid long, cvec array<bigint>"
    )
    assigned = _assign(corpus, seeds)
    got = {r.vec_id: r.cid for r in assigned.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}

    cents = {r.cid: r.cvec for r in _recompute(assigned).collect()}
    assert cents[0] == [(10 + 11 + 12) // 3, 10]
    assert cents[1] == [(-10 - 11 - 12) // 3, -10]  # floor division, exact


@given(
    st.lists(
        st.sampled_from(["hh1", "hh2"] + [f"rare{i}" for i in range(50)]),
        min_size=20,
        max_size=200,
    )
)
@_SETTINGS
def test_heavy_hitter_candidates_are_lossless(spark, terms):
    """Per-partition Misra-Gries (small k to stress decrements) must keep
    every term whose global frequency exceeds n/(k+1) — the two-pass
    heavy-hitters correctness precondition."""
    import pandas as pd

    k = 4

    def misra_gries(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for term in pdf["term"]:
                if term in counters:
                    counters[term] += 1
                elif len(counters) < k:
                    counters[term] = 1
                else:
                    for t in list(counters):
                        counters[t] -= 1
                        if counters[t] == 0:
                            del counters[t]
        yield pd.DataFrame({"term": list(counters.keys())})

    df = spark.createDataFrame([(t,) for t in terms], ["term"]).repartition(3)
    cands = {r.term for r in df.mapInPandas(misra_gries, "term string").collect()}

    n = len(terms)
    counts: dict[str, int] = {}
    for t in terms:
        counts[t] = counts.get(t, 0) + 1
    must_survive = {t for t, c in counts.items() if c > n / (k + 1)}
    assert must_survive <= cands


def test_pii_redaction_fires_on_planted_pii(spark):
    """The PII patterns must actually match and redact planted emails and
    phone numbers (the fixture corpus is PII-free, so the registered
    query's zero counts don't exercise the replace path)."""
    from pyspark.sql import functions as F

    from spark_streaming_twitter_spark.text.analysis import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    text = "contact jo.doe+x@example.co.uk or +1 (555) 123-4567 today"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    r = df.select(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0)).alias("e"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), 0)).alias("p"),
        redacted.alias("red"),
    ).collect()[0]
    assert r.e == 1 and r.p == 1
    assert r.red == "contact <EMAIL> or <PHONE> today"
    assert "@" not in r.red and "555" not in r.red


def test_observe_metrics_surface(spark):
    """df.observe(): the pipeline-metrics API — named aggregates computed
    as a side effect of the action, read back via the observation object.
    The instrumentation hook a production curation job uses to emit row
    counts / null counts per stage without extra passes."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("stage_metrics")
    df = spark.range(100).withColumn(
        "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
    )
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("int")).alias("n_nulls"),
    )
    assert observed.where(F.col("v").isNotNull()).count() == 90
    assert obs.get == {"n_rows": 100, "n_nulls": 10}
