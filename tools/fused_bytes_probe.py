"""Measure the fused flagship's BYTES claim (VERDICT r13 #2).

The fused topology (`stream_multimodal_ingest_to_training_fused`) is
measured honestly at a ~1.7x WALL loss vs the 4-stream form; its claimed
win is that it moves the corpus ONCE per trigger — one (doc_id, text)
spool feeds curation AND packing — where the 4-stream form spools the
corpus for the packer plus three payload-sized media spools for the
keeper streams. This probe turns that sentence into a number.

Method: `shutil.rmtree` is wrapped to size every temp artifact directory
(spool files, keeper indices, decision ledgers) at the moment each
topology tears it down — the streams themselves run UNCHANGED, so the
measured bytes are exactly what the production paths write/read (each
spool file is written once and read once by its stream; maxFilesPerTrigger
pins reads == writes). Output: one JSON line per topology with bytes by
category; capture with `tail -1` into
bench_artifacts/r14_fused_bytes_probe.json.

Usage:
    python tools/fused_bytes_probe.py [sf_dir ...]
defaults to /root/testdata/sf0.1; pass the scale_probe.py replicas for
the 4x/10x points.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ORIG_RMTREE = shutil.rmtree
_RECORDED: list[dict] = []


def _dir_stats(path: str) -> "tuple[int, int]":
    total = n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
                n += 1
            except OSError:
                pass
    return total, n


def _classify(root: str, sub: str, fname: str) -> str:
    rel = os.path.relpath(os.path.join(sub, fname), root)
    top = rel.split(os.sep)[0]
    if top.startswith("batch_"):
        return "spool"
    if "ledger" in top:
        return "ledger"
    if "index" in top or top == "flags":
        return "index"
    return "other"


def _measuring_rmtree(path, *args, **kwargs):
    if os.path.isdir(path):
        by_cat: dict[str, int] = {}
        files = 0
        for root, _dirs, fs in os.walk(path):
            for f in fs:
                try:
                    sz = os.path.getsize(os.path.join(root, f))
                except OSError:
                    continue
                cat = _classify(path, root, f)
                by_cat[cat] = by_cat.get(cat, 0) + sz
                files += 1
        _RECORDED.append(
            {
                "dir": os.path.basename(path),
                "bytes_by_category": by_cat,
                "bytes_total": sum(by_cat.values()),
                "n_files": files,
            }
        )
    return _ORIG_RMTREE(path, *args, **kwargs)


def main() -> None:
    shutil.rmtree = _measuring_rmtree

    from spark_streaming_twitter_spark.registry import load_all
    from spark_streaming_twitter_spark.session import get_spark

    spark = get_spark(app_name="fused-bytes-probe")
    specs = load_all()
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    out = []
    for sf_dir in sf_dirs:
        for topo, name in (
            ("four_stream", "stream_multimodal_ingest_to_training"),
            ("fused", "stream_multimodal_ingest_to_training_fused"),
        ):
            _RECORDED.clear()
            t0 = time.perf_counter()
            n_rows = len(specs[name].fn(spark, sf_dir).collect())
            wall = round(time.perf_counter() - t0, 3)
            cats: dict[str, int] = {}
            for r in _RECORDED:
                for c, b in r["bytes_by_category"].items():
                    cats[c] = cats.get(c, 0) + b
            out.append(
                {
                    "sf_dir": sf_dir,
                    "topology": topo,
                    "wall_s": wall,
                    "n_rows": n_rows,
                    "bytes_by_category": cats,
                    "bytes_total": sum(cats.values()),
                    "spool_bytes": cats.get("spool", 0),
                    "n_temp_dirs": len(_RECORDED),
                    "dirs": _RECORDED[:],
                }
            )
            print(
                f"# {sf_dir} {topo}: wall {wall}s rows {n_rows} "
                f"spool {cats.get('spool', 0)} total {sum(cats.values())}",
                file=sys.stderr,
            )
    # pair up ratios per sf_dir
    ratios = []
    for sf_dir in sf_dirs:
        four = next(
            r for r in out if r["sf_dir"] == sf_dir and r["topology"] == "four_stream"
        )
        fused = next(
            r for r in out if r["sf_dir"] == sf_dir and r["topology"] == "fused"
        )
        ratios.append(
            {
                "sf_dir": sf_dir,
                "spool_bytes_four_stream": four["spool_bytes"],
                "spool_bytes_fused": fused["spool_bytes"],
                "spool_ratio_four_over_fused": round(
                    four["spool_bytes"] / max(fused["spool_bytes"], 1), 3
                ),
                "total_bytes_four_stream": four["bytes_total"],
                "total_bytes_fused": fused["bytes_total"],
                "total_ratio_four_over_fused": round(
                    four["bytes_total"] / max(fused["bytes_total"], 1), 3
                ),
                "wall_ratio_fused_over_four": round(
                    fused["wall_s"] / max(four["wall_s"], 1e-9), 3
                ),
            }
        )
    print(json.dumps({"metric": "fused_bytes_probe", "runs": out, "ratios": ratios}))


if __name__ == "__main__":
    main()
