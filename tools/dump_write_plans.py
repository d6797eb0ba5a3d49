"""Dump .explain("formatted") evidence for plans/r16 (guide §7.2).

Two modes in one tool:
- batch query: dump the returned DataFrame's formatted plan;
- streaming query: additionally capture the formatted plan of EVERY
  DataFrame the query writes to parquet (DataFrameWriter.parquet is
  wrapped), so per-trigger write plans land exactly as executed.

Usage: python tools/dump_write_plans.py OUT_FILE QUERY [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_twitter_spark.registry import load_all
from spark_streaming_twitter_spark.session import get_spark


def _fmt(df) -> str:
    try:
        qe = df._jdf.queryExecution()
        return df.sparkSession._jvm.PythonSQLUtils.explainString(
            qe, "formatted"
        )
    except Exception as ex:  # plan capture must never fail the run
        return f"<explain failed: {ex}>"


def main() -> None:
    out_file, name = sys.argv[1], sys.argv[2]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(app_name="dump_write_plans")
    specs = load_all()

    captured: list[tuple[str, str]] = []
    # patch the CLASSIC DataFrame (pyspark.sql.DataFrame is the abstract
    # base in Spark 4; instances override localCheckpoint there)
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    orig = DataFrameWriter.parquet

    def patched(self, path, *a, **k):
        captured.append((str(path), _fmt(self._df)))
        return orig(self, path, *a, **k)

    # also capture the pre-checkpoint plan of every localCheckpoint: the
    # staged relations (doc lengths, token streams, keeper reports) are
    # eager, so their plans never appear in the returned frame
    orig_lc = DataFrame.localCheckpoint

    def patched_lc(self, *a, **k):
        captured.append(("<localCheckpoint>", _fmt(self)))
        return orig_lc(self, *a, **k)

    DataFrameWriter.parquet = patched
    DataFrame.localCheckpoint = patched_lc
    try:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        rows = len(df.collect())
        dt = time.perf_counter() - t0
        final_plan = _fmt(df)
    finally:
        DataFrameWriter.parquet = orig
        DataFrame.localCheckpoint = orig_lc

    with open(out_file, "w") as fh:
        fh.write(
            f"# {name} @ {sf_dir} — formatted plans as executed\n"
            f"# rows={rows} wall={dt:.3f}s\n\n"
            f"== RETURNED FRAME ==\n{final_plan}\n"
        )
        for i, (path, plan) in enumerate(captured):
            tail = "/".join(path.rstrip("/").split("/")[-2:])
            fh.write(f"\n== WRITE {i} -> .../{tail} ==\n{plan}\n")
    print(f"wrote {out_file}: returned frame + {len(captured)} write plans")


if __name__ == "__main__":
    main()
