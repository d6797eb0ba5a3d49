"""Phase profile of the fused flagship (r16, guide §1): monkeypatch the
harness/prober seams to time spool, each trigger body (probes vs drop
gate vs pack), stream machinery (run_foreach_batch minus trigger bodies)
and read-back. Timings print to stdout; the query still returns its
normal result (row count printed as a sanity check).

Usage: python tools/flagship_phase_probe.py [QUERY]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_twitter_spark.registry import load_all
from spark_streaming_twitter_spark.session import get_spark

_SPECS = load_all()  # registry first: phash oracles compose dedup entries

import spark_streaming_twitter_spark.multimodal.phash as ph  # noqa: E402
import spark_streaming_twitter_spark.streaming.harness as H  # noqa: E402

T = {"spool": 0.0, "triggers": 0.0, "probe": 0.0, "rfb": 0.0}


def patch() -> None:
    orig_spool = H.spool_ordered_batches
    orig_spool_rr = H.spool_roundrobin_batches

    def timed_spool(*a, **k):
        t0 = time.perf_counter()
        r = orig_spool(*a, **k)
        T["spool"] += time.perf_counter() - t0
        return r

    def timed_spool_rr(*a, **k):
        t0 = time.perf_counter()
        r = orig_spool_rr(*a, **k)
        T["spool"] += time.perf_counter() - t0
        return r

    H.spool_ordered_batches = timed_spool
    H.spool_roundrobin_batches = timed_spool_rr

    orig_rfb = H.run_foreach_batch

    def timed_rfb(sdf, write_batch, output_mode="update"):
        def wb(df, eid):
            t0 = time.perf_counter()
            write_batch(df, eid)
            dt = time.perf_counter() - t0
            T["triggers"] += dt
            print(f"  trigger {eid}: {dt:.3f}s", flush=True)

        t0 = time.perf_counter()
        r = orig_rfb(sdf, wb, output_mode)
        T["rfb"] += time.perf_counter() - t0
        return r

    H.run_foreach_batch = timed_rfb

    orig_mk = ph.make_chunk_keeper_prober
    orig_mkv = ph.make_video_keeper_prober

    def timed_mk(*a, **k):
        p = orig_mk(*a, **k)

        def wrapped(keys, *aa, **kk):
            t0 = time.perf_counter()
            r = p(keys, *aa, **kk)
            T["probe"] += time.perf_counter() - t0
            return r

        return wrapped

    def timed_mkv(*a, **k):
        p = orig_mkv(*a, **k)

        def wrapped(keys, *aa, **kk):
            t0 = time.perf_counter()
            r = p(keys, *aa, **kk)
            T["probe"] += time.perf_counter() - t0
            return r

        return wrapped

    ph.make_chunk_keeper_prober = timed_mk
    ph.make_video_keeper_prober = timed_mkv


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = sys.argv[1] if len(sys.argv) > 1 else (
        "stream_multimodal_ingest_to_training_fused_persisted"
    )
    spark = get_spark(app_name="flagship_phase_probe")
    specs = _SPECS
    specs[name].fn(spark, sf_dir).limit(1).collect()  # warm
    patch()
    for k in T:
        T[k] = 0.0
    t0 = time.perf_counter()
    rows = len(specs[name].fn(spark, sf_dir).collect())
    total = time.perf_counter() - t0
    print(
        f"{name}: total {total:.3f}s rows={rows}\n"
        f"  spool {T['spool']:.3f}s | triggers {T['triggers']:.3f}s "
        f"(probe wall {T['probe']:.3f}s, threaded) | "
        f"machinery {T['rfb'] - T['triggers']:.3f}s | "
        f"other {total - T['spool'] - T['rfb']:.3f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
