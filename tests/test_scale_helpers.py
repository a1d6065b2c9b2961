"""Skew helpers + streaming sliding windows."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from views_transformation_library_spark.functions import skew
from views_transformation_library_spark.streaming.windows import sliding_sum_stream


def test_salted_sum_matches_plain_sum(spark):
    df = spark.createDataFrame(
        [(k % 3, float(i)) for i, k in enumerate(range(300))], schema="k long, v double"
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["v"] for r in skew.salted_sum(df, ["k"], ["v"]).collect()}
    assert salted == pytest.approx(plain)


def test_salted_join_keys_match(spark):
    fact = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], schema="k long, v double")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], schema="k long, name string")
    fs = skew.with_salted_key(fact, "k", n_salts=4)
    ds = skew.explode_salts(dim, "k", n_salts=4)
    joined = fs.join(ds, "__salted_key")
    # every fact row finds exactly one dim match
    assert joined.count() == 3
    assert {r["name"] for r in joined.collect()} == {"a", "b"}


def test_sliding_sum_stream(spark, tmp_path):
    src = str(tmp_path / "s")
    os.makedirs(src)
    pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-02 00:00", "2024-01-05 00:00"]
            ),
            "user_id": [1, 1, 1],
            "value": [10.0, 20.0, 5.0],
        }
    ).to_parquet(src + "/a.parquet", coerce_timestamps="us", allow_truncated_timestamps=True)
    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double").parquet(src)
    )
    out = sliding_sum_stream(stream, window="2 days", slide="1 day", watermark="1 day")
    q = (
        out.writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM slide_out").collect()
    finally:
        q.stop()
    by_start = {str(r["window_start"]): r["moving_sum"] for r in rows}
    # window starting Jan 1 covers Jan 1-2: 30.0
    assert by_start["2024-01-01 00:00:00"] == 30.0
    # window starting Jan 4 covers Jan 5 event
    assert by_start["2024-01-04 00:00:00"] == 5.0
