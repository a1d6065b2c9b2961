"""Streaming sliding windows (the skew helpers were retired in r2 —
salted aggregation duplicated Spark's map-side partial aggregation for
sum/count, and join skew is AQE skew-join's job; pattern documented in
SCALE.md §skew)."""

import os

import pandas as pd

from views_transformation_library_spark.streaming.windows import sliding_sum_stream


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
