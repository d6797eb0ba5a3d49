"""Per-entry job/action profile (r16, guide §1): run registered queries,
report wall time and Spark JOB count (submitted jobs, read from the
DAGScheduler's job-id counter — the UI is disabled in session.py). The
job count is the driver-bound cost proxy the 8-vs-32-core scaling block
keeps flagging for the streaming entries — every saved action is a saved
scheduling round trip per trigger.

Usage: python tools/trigger_profile.py QUERY [QUERY...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROFILE_RUNS (default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_twitter_spark.registry import load_all
from spark_streaming_twitter_spark.session import get_spark


def _job_counter(spark) -> int:
    v = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return v.get() if hasattr(v, "get") else int(v)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    spark = get_spark(app_name="trigger_profile")
    specs = load_all()
    try:  # pre-r16 trees have no scoped-staging registry
        from spark_streaming_twitter_spark.catalog import release_staged
    except ImportError:
        def release_staged() -> None:
            pass

    names = sys.argv[1:]
    if not names:
        print("usage: trigger_profile.py QUERY [QUERY...]", file=sys.stderr)
        sys.exit(2)
    # warm the JVM once so run 0 isn't all codegen
    specs[names[0]].fn(spark, sf_dir).limit(1).collect()
    for name in names:
        spec = specs[name]
        for i in range(runs):
            release_staged()
            j0 = _job_counter(spark)
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            rows = len(df.collect())
            dt = time.perf_counter() - t0
            j1 = _job_counter(spark)
            print(
                f"{name} run{i}: {dt:.3f}s jobs={j1 - j0} rows={rows}",
                flush=True,
            )


if __name__ == "__main__":
    main()
