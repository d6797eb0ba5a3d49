"""Replay the round driver's correctness gate: vanilla SparkSession vs DuckDB
at sf0.01. Usage: python tools/verify_driver.py [query ...] (default: all).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(d: pd.DataFrame) -> pd.DataFrame:
    d = d.reindex(sorted(d.columns), axis=1)
    if len(d):
        d = d.sort_values(by=list(d.columns), kind="mergesort", na_position="last")
    return d.reset_index(drop=True)


def values_equal(g, w) -> bool:
    # The driver's value-hash serializes values, so int 0 vs float 0.0 hash
    # differently even though 0 == 0.0 — be type-sensitive for numerics.
    if isinstance(g, (int, float)) and isinstance(w, (int, float)):
        if type(g) is not type(w):
            return False
    if isinstance(g, float) and isinstance(w, float):
        return (math.isnan(g) and math.isnan(w)) or g == w
    if g is None and w is None:
        return True
    try:
        if pd.isna(g) and pd.isna(w):
            return True
    except (TypeError, ValueError):
        pass
    return g == w


def main() -> int:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    names = sys.argv[1:] or sorted(qs)
    fails = []
    for name in names:
        if name not in osql:
            n = qs[name](spark, SF).count()
            print(f"{name}: rows-only, {n} rows")
            continue
        sdf = canon(qs[name](spark, SF).toPandas())
        odf = canon(con.execute(osql[name]).fetchdf())
        ok = list(sdf.columns) == list(odf.columns) and len(sdf) == len(odf)
        why = "" if ok else f"cols/rows: spark {list(sdf.columns)}x{len(sdf)} vs oracle {list(odf.columns)}x{len(odf)}"
        if ok:
            for c in sdf.columns:
                bad = [
                    (g, w)
                    for g, w in zip(sdf[c].tolist(), odf[c].tolist())
                    if not values_equal(g, w)
                ]
                if bad:
                    ok, why = False, f"col {c!r}: {bad[:3]}"
                    break
        print(f"{name}: {'OK' if ok else 'MISMATCH ' + why} ({len(sdf)} rows)")
        if not ok:
            fails.append(name)
    print("FAILURES:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
