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

    python tools/self_dedup_cost_probe.py [SF_DIR] [K]  # default sf0.1, 12

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    unordered = len(sys.argv) > 3 and sys.argv[3] == "unordered"

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
