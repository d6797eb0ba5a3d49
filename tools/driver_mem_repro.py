"""Driver-memory reproduction for the r13 '10x needs 16g' claim.

Runs the collect-materializing flagship lifecycle variants vs the
`_persisted` production read-back twins, back-to-back in ONE session at
the given fixture dir (pass the 10x replica), and reports wall + the GC
symptom counts from the session's own GC log (pass the log path the
session was started with via SPARK_GRAFT_EXTRA_JAVA_OPTS).

Usage:
    SPARK_GRAFT_EXTRA_JAVA_OPTS="-Xlog:gc*:file=/tmp/gc_repro.log" \
        python tools/driver_mem_repro.py /tmp/spark_graft_scale_sf10x /tmp/gc_repro.log
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gc_counts(log_path: str) -> dict:
    try:
        txt = open(log_path).read()
    except OSError:
        return {}
    pauses = re.findall(
        r"Pause (\w+) \(([^)]+)\) \(([^)]+)\) (\d+)M->(\d+)M\((\d+)M\) ([0-9.]+)ms",
        txt,
    )
    return {
        "pauses": len(pauses),
        "full": sum(1 for p in pauses if p[0] == "Full"),
        "gclocker_young": sum(1 for p in pauses if "GCLocker" in p[2]),
        "max_pause_ms": max((float(p[6]) for p in pauses), default=0.0),
        "max_heap_used_m": max((int(p[3]) for p in pauses), default=0),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_sf10x"
    gc_log = sys.argv[2] if len(sys.argv) > 2 else None

    from spark_streaming_twitter_spark.registry import load_all
    from spark_streaming_twitter_spark.session import get_spark

    spark = get_spark(app_name="driver-mem-repro")
    specs = load_all()
    out = []
    for group, names in (
        (
            "collect_lifecycle",
            [
                "stream_multimodal_ingest_to_training",
                "stream_multimodal_ingest_to_training_unordered",
                "stream_multimodal_ingest_to_training_fused",
            ],
        ),
        (
            "persisted",
            [
                "stream_multimodal_ingest_to_training_persisted",
                "stream_multimodal_ingest_to_training_unordered_persisted",
                "stream_multimodal_ingest_to_training_fused_persisted",
            ],
        ),
    ):
        before = gc_counts(gc_log) if gc_log else {}
        t0 = time.perf_counter()
        rows = 0
        for n in names:
            rows += len(specs[n].fn(spark, sf_dir).collect())
        wall = round(time.perf_counter() - t0, 3)
        after = gc_counts(gc_log) if gc_log else {}
        delta = {
            k: after.get(k, 0) - before.get(k, 0)
            for k in ("pauses", "full", "gclocker_young")
        }
        delta["max_pause_ms_after"] = after.get("max_pause_ms")
        delta["max_heap_used_m_after"] = after.get("max_heap_used_m")
        out.append({"group": group, "wall_s": wall, "rows": rows, "gc": delta})
        print(f"# {group}: wall {wall}s rows {rows} gc {delta}", file=sys.stderr)
    print(json.dumps({"metric": "driver_mem_repro", "sf_dir": sf_dir, "runs": out}))


if __name__ == "__main__":
    main()
