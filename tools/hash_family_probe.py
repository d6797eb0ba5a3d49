"""Settle the hash-family drift (VERDICT r11 'what's wrong' #3):
``doc_fingerprints`` and ``dedup_simhash_signatures`` read 1.27-1.28x
between the r10 and r11 MORNING samples at a LOWER load indicator, so
load alone doesn't explain the direction. Three candidate causes:

- host load (should scale the CONTROL queries identically),
- Catalyst plan-compile constant (should vanish on repeat calls within
  one session — the IVF-family pattern measured in r11),
- a real data-path regression (persists in steady-state, survives load
  normalization against the controls).

This probe times each suspect and three control anchors in ONE session:
one fresh first call (plan compile + execution) then ``reps`` repeat
calls (fresh DataFrame per call — same as bench.py — but the JVM/JIT
and codegen caches are warm). Reported per query: first-call seconds,
steady-state p50, and first/steady ratio. Diagnosis: a first/steady
ratio >> controls' = compile-constant; an elevated steady-state
suspect/control ratio vs the committed r10/r11 morning artifacts = real.

Usage: python tools/hash_family_probe.py [SF_DIR] [REPS]
Prints one JSON line; committed under bench_artifacts/ by round
convention.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SUSPECTS = ["doc_fingerprints", "dedup_simhash_signatures"]
CONTROLS = ["dedup_exact", "similarity_topk_cosine", "user_event_sessions"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.appName("hash_family_probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    # one warmup query to absorb session/JVM bootstrap before ANY timing
    qs["dedup_exact"](spark, sf_dir).limit(1).collect()

    out: dict[str, dict] = {}
    for name in SUSPECTS + CONTROLS:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        steady = statistics.median(times)
        out[name] = {
            "first_s": round(first, 3),
            "steady_p50_s": round(steady, 3),
            "first_over_steady": round(first / steady, 3) if steady else None,
            "reps": times and [round(t, 3) for t in times],
        }

    # prior morning samples for the drift comparison, load-normalized by
    # this probe's own control steady-state vs those artifacts' entries
    history = {}
    for rnd in ("r10", "r11", "r12"):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_artifacts",
            f"{rnd}_local_sf0.1_1x_morning.json",
        )
        if os.path.exists(path):
            with open(path) as fh:
                d = json.load(fh)
            qsrc = d.get("queries_p50") or d.get("queries") or {}
            history[rnd] = {
                n: qsrc.get(n) for n in SUSPECTS + CONTROLS if n in qsrc
            }

    print(
        json.dumps(
            {
                "metric": "hash_family_drift_probe",
                "sf_dir": sf_dir,
                "queries": out,
                "morning_history_p50": history,
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
