"""Measure the heap-vs-RocksDB state-backend CROSSOVER (VERDICT r7 ask #5).

Round 7 measured the state-heavy sliding pair on a roomy heap and found
heap faster at every state size it could reach (2.6 vs 3.0 s at 1x, 17.8
vs 31.8 s at 10x) — expected on a 128 GiB box, but it left the "RocksDB
is the 100 TB backend" claim argued, not measured. This probe measures
the other regime: the SAME queries under a CONSTRAINED JVM heap (state
no longer fits), where the HDFS-backed provider must hold every state
row as JVM objects while RocksDB keeps them in native memory + local
disk. Each (backend, heap) cell runs in a FRESH subprocess because
spark.driver.memory is fixed at JVM launch.

Usage:
    python tools/state_backend_probe.py [sf_dir] [mem1 mem2 ...]
    # default: /tmp/spark_graft_scale_sf10x at 8g and 2g

Prints one JSON line per cell: {"backend", "mem", "ok", "sec", "err"}.
A cell that OOMs/dies reports ok=false with the failure class — that IS
the measurement (the heap backend's failure point is the crossover).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY = {
    "heap": "stream_user_sliding_state_heap",
    "rocksdb": "stream_user_sliding_state_rocksdb",
}
TIMEOUT_S = 1200


def run_child(backend: str, sf_dir: str) -> None:
    sys.path.insert(0, REPO)
    from spark_streaming_twitter_spark.registry import load_all
    from spark_streaming_twitter_spark.session import get_spark

    spec = load_all()[QUERY[backend]]
    spark = get_spark(app_name=f"state-probe-{backend}")
    t0 = time.monotonic()
    rows = spec.fn(spark, sf_dir).collect()
    sec = time.monotonic() - t0
    print(
        "CHILD_RESULT "
        + json.dumps({"sec": round(sec, 2), "rows": len(rows)}),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--run":
        if len(sys.argv) < 4:
            print(
                "usage: state_backend_probe.py --run {heap|rocksdb} SF_DIR",
                file=sys.stderr,
            )
            raise SystemExit(2)
        run_child(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_sf10x"
    mems = sys.argv[2:] if len(sys.argv) > 2 else ["8g", "2g"]
    for mem in mems:
        for backend in ("heap", "rocksdb"):
            env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
            t0 = time.monotonic()
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--run", backend, sf_dir],
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=TIMEOUT_S,
                )
                child = None
                for line in proc.stdout.splitlines():
                    if line.startswith("CHILD_RESULT "):
                        child = json.loads(line[len("CHILD_RESULT "):])
                if proc.returncode == 0 and child:
                    out = {
                        "backend": backend,
                        "mem": mem,
                        "ok": True,
                        "sec": child["sec"],
                        "err": None,
                    }
                else:
                    tail = (proc.stderr or proc.stdout).strip().splitlines()
                    err = next(
                        (
                            ln
                            for ln in reversed(tail)
                            if "OutOfMemory" in ln or "Error" in ln
                        ),
                        tail[-1] if tail else f"rc={proc.returncode}",
                    )
                    out = {
                        "backend": backend,
                        "mem": mem,
                        "ok": False,
                        "sec": round(time.monotonic() - t0, 2),
                        "err": err[:300],
                    }
            except subprocess.TimeoutExpired:
                out = {
                    "backend": backend,
                    "mem": mem,
                    "ok": False,
                    "sec": TIMEOUT_S,
                    "err": f"timeout after {TIMEOUT_S}s",
                }
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
