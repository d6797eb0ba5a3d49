"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <float>}

Each query is materialized with a full collect (the driver's correctness
harness collects too, so this measures the same path users run). The
registry's ``bench=True`` specs are the headline set — the reference's three
query shapes plus the heaviest relational/LLM-pipeline operators.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_twitter_spark.registry import load_all
from spark_streaming_twitter_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    specs = load_all()
    bench_specs = {n: s for n, s in specs.items() if s.bench}

    # Warm the JVM + parquet footers with one tiny action so query timings
    # measure the plan, not session startup. (A full per-query warmup pass
    # was measured NET-negative: it doubles the compiled-plan count for one
    # cold-start saved per query.)
    next(iter(bench_specs.values())).fn(spark, sf_dir).limit(1).collect()

    # min-of-N runs per query: the first run folds in codegen/JIT compile
    # for that plan, later runs measure steady-state throughput; min also
    # rejects host-side noise (this box shows idle load spikes).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name, spec in sorted(bench_specs.items()):
        best, n = float("inf"), 0
        for _ in range(runs):
            # Time fn + collect: some queries do their real work inside fn
            # (streaming runs to completion, the CC label loop iterates) —
            # timing only the collect would report those as near-zero.
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = len(df.collect())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
