"""Replays the driver's correctness gate locally: every registered query with
an oracle must match DuckDB at sf0.001 (fast) — the driver runs sf0.01."""

from __future__ import annotations

import pytest

from spark_streaming_twitter_spark.registry import load_all
from tests.oracle import assert_matches_oracle

SPECS = load_all()
WITH_ORACLE = sorted(name for name, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(name for name, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    assert_matches_oracle(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
