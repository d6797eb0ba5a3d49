"""Measure the SELF-referential ingest-dedup claim: per-batch cost bounded
by state PROBES, not history rescans.

``stream_text_minhash_self_dedup`` (dedup/dedup.py) maintains its dedup
index in tws MapState sharded by (band, band_key-prefix): a micro-batch
pays one RocksDB point-probe (plus a point-insert when the key is novel)
per TOUCHED band key, so batch N should cost what batch 1 costs even
though the state map has grown N times larger. This probe turns that into
numbers: K micro-batches of FIXED size, each carrying fresh doc_ids where
HALF the documents are verbatim duplicates of batch 0 (pure probe hits)
and half carry batch-salted text (novel band keys — state grows every
batch), per-trigger ``addBatch`` from the streaming progress events,
first-vs-last-half p50 ratio. Flat (~1.0) = probe-bounded; a design that
rescanned or re-banded history would grow monotonically.

Relative comparison within one run, so host load shifts both halves
equally. Usage:

    python tools/self_dedup_cost_probe.py [SF_DIR] [K] [MODE]

MODE: (default ordered) | unordered | ttl | ttl_unswept
  - ``ttl`` runs the bounded-disorder TTL's SORTED-WINDOW processor with
    the watermark sweep (event-time timers evicting window ids below
    watermark - horizon) and reports, per batch, addBatch ms AND the
    TOTAL live window ids in state (the processor self-reports via
    instrumentation rows) — the state-BOUND evidence: flat under the
    sweep.
  - ``ttl_unswept`` is the identical processor with timeMode=None (the
    unbounded-disorder variant's configuration): entries must grow
    monotonically, pricing exactly what the sweep buys. Emission rows
    (non-instrumentation) must match the swept run bitwise.
Default sf for the ttl modes is sf0.01 (the instrumentation map scan is
probe-only overhead, kept cheap).

Prints one JSON line; the round convention commits it under
bench_artifacts/.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def run_ttl_probe(spark, sf_dir: str, k: int, swept: bool) -> None:
    """State-bound probe for the sorted-window TTL dedup: K batches of
    fixed size whose doc_ids advance by SPAN per batch (even docs reuse
    batch-0 text, so their band keys RECUR with ever-new ids — per-key
    windows grow unless swept; odd docs are batch-salted — novel keys).
    horizon = SPAN, watermark delay D = 5 s, so the sweep should hold
    live window ids ~flat while the unswept twin grows linearly. Each
    batch carries its index as a data column; the processor emits one
    instrumentation row per (key-group, batch) with the group's total
    live window ids AFTER processing, summed per batch downstream."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from spark_streaming_twitter_spark.catalog import table
    from spark_streaming_twitter_spark.dedup.dedup import (
        SHINGLE_N,
        minhash_band_structs_from_sig,
        minhash_signature_struct,
        shingles,
        tokens,
    )

    SPAN = 1_000
    HORIZON = SPAN
    DELAY = 5
    BASE = 1_700_000_000

    class ProbeWindow(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._w = handle.getMapState(
                "window", "band_key string", "ids array<bigint>"
            )

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows), ignore_index=True)
            batch_idx = int(pdf["b"].max())
            out_doc, out_ref = [], []
            batch_max = int(pdf["doc_id"].max())
            for bk, grp in pdf.groupby("band_key", sort=True):
                new = {int(d) for d in grp["doc_id"]}
                cur = self._w.getValue((bk,))
                merged = sorted(
                    new.union(int(x) for x in cur[0])
                ) if cur is not None else sorted(new)
                for p, s in zip(merged, merged[1:]):
                    if (p in new or s in new) and s - p <= HORIZON:
                        out_doc.append(s)
                        out_ref.append(p)
                self._w.updateValue((bk,), (merged,))
            if swept:
                # register at watermark + 1 ms and NEVER delete pending
                # timers: a timer above the (one-batch-lagging) watermark
                # is replaced before it can fire, and deleting in
                # handleInputRows kills the expired-but-unprocessed timer
                # in the same batch — both measured failure modes; fired
                # timers are auto-removed, so at most a couple pend
                self._h.registerTimer(
                    timerValues.getCurrentWatermarkInMs() + 1
                )
            # instrumentation: this key-group's live window ids (probe-only
            # full-map scan — the production processor never does this)
            n_live = sum(len(v[0]) for _, v in self._w.iterator())
            out_doc.append(-1)
            out_ref.append(n_live)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "ref_id": out_ref,
                    "band": [batch_idx] * len(out_doc),
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            wm_ms = timerValues.getCurrentWatermarkInMs()
            stale = []
            for k_, v_ in self._w.iterator():
                ids = [int(x) for x in v_[0]]
                keep = [
                    i for i in ids if (BASE + i + HORIZON) * 1000 >= wm_ms
                ]
                if len(keep) != len(ids):
                    stale.append((k_[0], keep))
            for bk, keep in stale:
                if keep:
                    self._w.updateValue((bk,), (keep,))
                else:
                    self._w.removeKey((bk,))
            return iter(())

        def close(self) -> None:
            pass

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch_rows = docs.count()
    assert batch_rows < SPAN, "SPAN must exceed the per-batch id range"
    tmp = tempfile.mkdtemp(prefix="ttl_sweep_probe_")
    try:
        data_dir = os.path.join(tmp, "stream")
        os.makedirs(data_dir)
        for i in range(k):
            stage = os.path.join(tmp, f"_stage_{i}")
            batch = docs.select(
                (F.col("doc_id") + i * SPAN).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 2 == 1,
                    F.concat(F.col("text"), F.lit(f" probebatch{i}")),
                )
                .otherwise(F.col("text"))
                .alias("text"),
                F.lit(i).alias("b"),
            )
            batch.coalesce(1).write.parquet(stage)
            part = next(
                f for f in os.listdir(stage) if f.endswith(".parquet")
            )
            dst = os.path.join(data_dir, f"batch_{i:03d}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            shutil.rmtree(stage)
            os.utime(dst, (1_000_000_000 + i * 3600,) * 2)

        stream = (
            spark.readStream.schema("doc_id long, text string, b int")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(data_dir)
        )
        cpus = spark.sparkContext.defaultParallelism
        bands = (
            stream.repartition(cpus)
            .withColumn(
                "ts",
                F.timestamp_seconds(F.lit(BASE) + F.col("doc_id")),
            )
            .withWatermark("ts", f"{DELAY} seconds")
            .withColumn(
                "sig",
                minhash_signature_struct(
                    shingles(tokens(F.lower(F.col("text"))), SHINGLE_N)
                ),
            )
            .select(
                "doc_id",
                "b",
                "ts",
                F.explode(
                    minhash_band_structs_from_sig(F.col("sig"))
                ).alias("bk"),
            )
            .select(
                "doc_id",
                "b",
                "ts",
                F.col("bk.band").alias("band0"),
                F.col("bk.band_key").alias("band_key"),
                F.substring("bk.band_key", 1, 1).alias("pfx"),
            )
        )
        hits = bands.groupBy("band0", "pfx").transformWithStateInPandas(
            statefulProcessor=ProbeWindow(),
            outputStructType="doc_id bigint, ref_id bigint, band int",
            outputMode="Update",
            timeMode="EventTime" if swept else "None",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        t0 = time.time()
        q = (
            hits.writeStream.format("memory")
            .queryName("ttl_sweep_probe")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        wall = time.time() - t0
        sink = spark.table("ttl_sweep_probe")
        live = {
            int(r["band"]): int(r["n"])
            for r in sink.where(F.col("doc_id") == -1)
            .groupBy("band")
            .agg(F.sum("ref_id").alias("n"))
            .collect()
        }
        n_emissions = sink.where(F.col("doc_id") >= 0).count()
        per_batch = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "add_batch_ms": p["durationMs"]["addBatch"],
            }
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    times = [b["add_batch_ms"] for b in per_batch]
    half = len(times) // 2
    first = statistics.median(times[1:half] or times[:half])
    last = statistics.median(times[half:])
    entries = [live.get(i, 0) for i in sorted(live)]
    print(
        json.dumps(
            {
                "metric": "ttl_sweep_state_bound_probe",
                "mode": "ttl" if swept else "ttl_unswept",
                "sf_dir": sf_dir,
                "batches": len(times),
                "rows_per_batch": batch_rows,
                "horizon": HORIZON,
                "watermark_delay_s": DELAY,
                "live_window_ids_per_batch": entries,
                "live_last_over_first": (
                    round(entries[-1] / entries[0], 3) if entries and entries[0]
                    else None
                ),
                "n_emission_rows": n_emissions,
                "per_batch": per_batch,
                "first_half_p50_ms": first,
                "last_half_p50_ms": last,
                "last_over_first": round(last / first, 3) if first else None,
                "wall_s": round(wall, 2),
            },
            sort_keys=True,
        )
    )


def main() -> None:
    mode = sys.argv[3] if len(sys.argv) > 3 else "ordered"
    default_sf = (
        "/root/testdata/sf0.01" if mode.startswith("ttl")
        else "/root/testdata/sf0.1"
    )
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else default_sf
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    unordered = mode == "unordered"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.appName("self_dedup_cost_probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from spark_streaming_twitter_spark.catalog import table
    from spark_streaming_twitter_spark.dedup.dedup import (
        SHINGLE_N,
        minhash_band_structs_from_sig,
        minhash_signature_struct,
        shingles,
        tokens,
    )
    from spark_streaming_twitter_spark.streaming.queries import (
        _forward_vendored_protobuf_to_workers,
        _protobuf_available,
    )

    if not _protobuf_available():
        print(json.dumps({"metric": "self_dedup_per_batch_cost",
                          "err": "no protobuf runtime"}))
        return
    _forward_vendored_protobuf_to_workers(spark)

    if mode.startswith("ttl"):
        run_ttl_probe(spark, sf_dir, k, swept=(mode == "ttl"))
        spark.stop()
        return

    class BandOwners(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._owners = handle.getMapState(
                "owners", "band_key string", "ref_id bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            band = int(key[0])
            pdf = pd.concat(list(rows), ignore_index=True)
            out_doc: list[int] = []
            out_ref: list[int] = []
            for bk, grp in pdf.groupby("band_key", sort=True):
                ids = sorted(int(d) for d in grp["doc_id"])
                cur = self._owners.getValue((bk,))
                if cur is not None:
                    owner = int(cur[0])
                else:
                    owner = ids.pop(0)
                    self._owners.updateValue((bk,), (owner,))
                out_doc.extend(ids)
                out_ref.extend([owner] * len(ids))
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": out_doc,
                        "ref_id": out_ref,
                        "band": [band] * len(out_doc),
                    }
                )

        def close(self) -> None:
            pass

    class MinIdOwners(StatefulProcessor):
        """The DISORDER-TOLERANT processor (min-id reconciliation with
        demotion) under the probe's worst case: with decreasing batch
        offsets every probe-hit key DEMOTES every batch (get + update =
        2 round trips per touched key, the maximum state traffic)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._owners = handle.getMapState(
                "owners", "band_key string", "ref_id bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            band = int(key[0])
            pdf = pd.concat(list(rows), ignore_index=True)
            out_doc: list[int] = []
            out_ref: list[int] = []
            for bk, grp in pdf.groupby("band_key", sort=True):
                ids = sorted(int(d) for d in grp["doc_id"])
                cur = self._owners.getValue((bk,))
                owner = int(cur[0]) if cur is not None else None
                emit = ids
                if owner is None or ids[0] < owner:
                    demoted = owner
                    owner = ids[0]
                    self._owners.updateValue((bk,), (owner,))
                    emit = ids[1:] + ([demoted] if demoted is not None else [])
                out_doc.extend(emit)
                out_ref.extend([owner] * len(emit))
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": out_doc,
                        "ref_id": out_ref,
                        "band": [band] * len(out_doc),
                    }
                )

        def close(self) -> None:
            pass

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch_rows = docs.count()
    tmp = tempfile.mkdtemp(prefix="self_dedup_probe_")
    try:
        # K fixed-size batches: doc_ids offset per batch (all fresh keys
        # for the state's doc-id values), EVEN doc_ids keep batch-0 text
        # (pure probe hits against ever-older state), ODD doc_ids get
        # batch-salted text (novel band keys -> the map GROWS every batch).
        data_dir = os.path.join(tmp, "stream")
        os.makedirs(data_dir)
        for i in range(k):
            stage = os.path.join(tmp, f"_stage_{i}")
            # unordered mode: offsets DECREASE, so every probe-hit key
            # demotes its owner every batch — the worst-case state load
            off = ((k - i) if unordered else i) * 10_000_000
            batch = docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 2 == 1,
                    F.concat(F.col("text"), F.lit(f" probebatch{i}")),
                )
                .otherwise(F.col("text"))
                .alias("text"),
            )
            batch.coalesce(1).write.parquet(stage)
            part = next(
                f for f in os.listdir(stage) if f.endswith(".parquet")
            )
            dst = os.path.join(data_dir, f"batch_{i:03d}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            shutil.rmtree(stage)
            os.utime(dst, (1_000_000_000 + i * 3600,) * 2)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(data_dir)
        )
        bands = (
            stream.repartition(cpus)
            .withColumn(
                "sig",
                minhash_signature_struct(
                    shingles(tokens(F.lower(F.col("text"))), SHINGLE_N)
                ),
            )
            .select(
                "doc_id",
                F.explode(
                    minhash_band_structs_from_sig(F.col("sig"))
                ).alias("bk"),
            )
            .select(
                "doc_id",
                F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"),
                F.substring("bk.band_key", 1, 1).alias("pfx"),
            )
        )
        hits = bands.groupBy("band", "pfx").transformWithStateInPandas(
            statefulProcessor=MinIdOwners() if unordered else BandOwners(),
            outputStructType="doc_id bigint, ref_id bigint, band int",
            outputMode="Update",
            timeMode="None",
        )
        key = "spark.sql.streaming.stateStore.providerClass"
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        t0 = time.time()
        q = (
            hits.writeStream.format("memory")
            .queryName("self_dedup_probe")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        wall = time.time() - t0
        per_batch = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "add_batch_ms": p["durationMs"]["addBatch"],
            }
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    times = [b["add_batch_ms"] for b in per_batch]
    half = len(times) // 2
    # drop batch 0 from the first half: it folds in plan codegen + state
    # store bootstrap, constants rather than history effects
    first = statistics.median(times[1:half] or times[:half])
    last = statistics.median(times[half:])
    print(
        json.dumps(
            {
                "metric": "self_dedup_per_batch_cost",
                "mode": "unordered" if unordered else "ordered",
                "sf_dir": sf_dir,
                "batches": len(times),
                "rows_per_batch": batch_rows,
                "per_batch": per_batch,
                "first_half_p50_ms": first,
                "last_half_p50_ms": last,
                "last_over_first": round(last / first, 3) if first else None,
                "wall_s": round(wall, 2),
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
