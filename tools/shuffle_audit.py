"""Measured shuffle audit: bytes in vs bytes shuffled, per headline query.

SCALE.md argues every hot plan minimizes shuffle (map-side partials,
broadcast dims, candidate-restricted joins). This probe turns the argument
into numbers: for each audited query it runs the full plan and then sums,
over exactly the stages that run spawned, the UI REST metrics

    input_mb     — bytes read from parquet scans
    shuf_w_mb    — shuffle bytes written (map side of every exchange)
    shuf_r_mb    — shuffle bytes read (reduce side; > write when a stage
                   retries or an exchange is reused)
    spill_mb     — disk spill (0 expected everywhere at bench scale)

and prints one JSON line per query with the RECORD amplification ratio
shuffle-write-records / input-records (bytes underreport on small pruned
parquet, records are scale-faithful). The interesting read is the SHAPE:
aggregation queries sit far below 1 (partial aggregates move group
cardinality, not rows), broadcast-dim joins shuffle only final partials,
candidate-restricted similarity/dedup stay bounded by candidate count,
and the one deliberate outlier (pack_training_sequences repartitions the
full token payload by design) documents its own cost.

Streaming queries are excluded: they run inside their own harness
sessions, so their stages are invisible to this session's UI endpoint.

Usage: python tools/shuffle_audit.py [name ...]   # default: AUDIT_SET
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

AUDIT_SET = (
    # scan-heavy aggregation: partial aggs move groups, not rows
    "pricing_summary",
    # TakeOrdered top-k: per-partition heads, no global sort shuffle
    "top_revenue_orders",
    # broadcast dim join: only the final group-by partials shuffle
    "part_brand_revenue",
    # two-stage explode + argmax: term partials, then group keys
    "trending_terms_by_source",
    # union-tag as-of join: ONE shuffle on user_id
    "asof_signup_before_purchase",
    # bin-bucketed interval join: fact side never reshuffles (broadcast bins)
    "events_interval_burst_stats",
    # banded LSH self-join: bucket-restricted candidate pairs only
    "dedup_minhash_lsh_pairs",
    # LSH candidates + verify: adds the signature re-check join
    "dedup_near_duplicates",
    # brute-force cosine: broadcast query side, corpus streams in place
    "similarity_topk_cosine",
    # multi-probe LSH: query-side probe expansion, index untouched
    "similarity_ann_multiprobe_topk",
    # IVF probe: broadcast centroids, cell-keyed equi join
    "similarity_ivf_nprobe_topk",
    # deliberate outlier: repartitions the token payload by design
    "pack_training_sequences",
    # multi-writer packing: per-part windows + a <= 10^4-row coordinator
    "pack_training_sequences_ranged",
    # provenance inverse: row-local span explode + one bounded agg
    "training_sequence_manifest",
    # loader order: sharded two-stage rank, broadcast prefix table
    "training_epoch_shuffle",
    # capstone: one fact-fact seq_id join above audited stages
    "training_run_order",
    # post-hoc audit: two broadcasts + one scan, corpus never shuffles
    "contamination_blast_radius",
    # corpus explode collapsing into the alphabet-bounded LM model
    "doc_charlm_score",
    # rank-window tertile split on top of the charlm plan
    "doc_charlm_ccnet_buckets",
)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}{path}", timeout=10
    ) as r:
        return json.load(r)


def _mb(n: int) -> float:
    return round(n / 1e6, 2)


def main(names: list[str]) -> None:
    from pyspark.sql import SparkSession
    from spark_streaming_twitter_spark.registry import load_all

    specs = load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("shuffle_audit")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        known = {s["stageId"] for s in _api(spark, "/stages")}
        t0 = time.time()
        n_rows = len(specs[name].fn(spark, SF_DIR).collect())
        wall = time.time() - t0
        stages = [
            s
            for s in _api(spark, "/stages?status=complete")
            if s["stageId"] not in known
        ]
        inp = sum(s["inputBytes"] for s in stages)
        inp_rec = sum(s["inputRecords"] for s in stages)
        sw = sum(s["shuffleWriteBytes"] for s in stages)
        sw_rec = sum(s["shuffleWriteRecords"] for s in stages)
        sr = sum(s["shuffleReadBytes"] for s in stages)
        spill = sum(s["diskBytesSpilled"] for s in stages)
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": n_rows,
                    "wall_s": round(wall, 2),
                    "stages": len(stages),
                    "input_mb": _mb(inp),
                    "input_rows": inp_rec,
                    "shuf_w_mb": _mb(sw),
                    "shuf_rows": sw_rec,
                    "shuf_r_mb": _mb(sr),
                    "spill_mb": _mb(spill),
                    "rows_moved_per_row_read": (
                        round(sw_rec / inp_rec, 4) if inp_rec else None
                    ),
                },
                sort_keys=True,
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main(list(sys.argv[1:]) or list(AUDIT_SET))
