"""Time-series sink tests: point normalization, line protocol, epoch writes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_twitter_spark.streaming.sinks import (
    as_points,
    parquet_point_writer,
    to_influx_line,
)


def _result_df(spark):
    return spark.createDataFrame(
        [("2024-01-01 10:00:00", "spark", 7, 3.5)],
        ["window_end", "hashtag", "n", "score"],
    ).withColumn("window_end", F.col("window_end").cast("timestamp"))


def test_as_points_schema_and_values(spark):
    pts = as_points(
        _result_df(spark),
        measurement="TrendingHashTagSpark",
        time_col="window_end",
        tag_cols=["hashtag"],
        field_cols=["n", "score"],
    )
    assert [f.name for f in pts.schema.fields] == [
        "time",
        "measurement",
        "tags",
        "fields",
    ]
    r = pts.collect()[0]
    assert r.measurement == "TrendingHashTagSpark"
    assert r.tags == {"hashtag": "spark"}
    assert r.fields == {"n": 7.0, "score": 3.5}


def test_influx_line_protocol_deterministic(spark):
    pts = as_points(
        _result_df(spark),
        measurement="m",
        time_col="window_end",
        tag_cols=["hashtag"],
        field_cols=["score", "n"],  # declaration order must not matter
    )
    line = pts.select(to_influx_line().alias("l")).collect()[0].l
    assert line == "m,hashtag=spark n=7.0,score=3.5 1704103200"


def test_parquet_point_writer_appends_epochs(spark, tmp_path):
    out = os.path.join(str(tmp_path), "points")
    pts = as_points(
        _result_df(spark), "m", "window_end", ["hashtag"], ["n"]
    )
    writer = parquet_point_writer(out)
    writer(pts, 0)
    writer(pts, 1)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert sorted(r.epoch for r in back.select("epoch").collect()) == [0, 1]
