"""Local mirror of the driver's DuckDB-oracle comparison.

The driver sorts columns by name, then does an order-insensitive value hash.
We reproduce that as: sort columns by name → canonical row sort → exact
compare (floats must match to ~1e-12 because our queries do exact decimal
accumulation — see functions/numeric.py).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from spark_streaming_twitter_spark.catalog import TABLES

_REL_TOL = 1e-12


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Decimal/HUGEINT objects → float/int for comparison
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (int,)):
                df[c] = df[c].astype("Int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=_REL_TOL, abs_tol=1e-12)
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(run_oracle(sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        bad = [
            (i, g, w) for i, (g, w) in enumerate(zip(gv, wv)) if not _values_equal(g, w)
        ]
        assert not bad, f"column {c!r}: first mismatches {bad[:5]}"
