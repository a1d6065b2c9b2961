"""Source/sink round-trips: csv, json, partitioned parquet write + pruning."""

from pyspark.sql import functions as F

from views_transformation_library_spark import plans, sources


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], schema="id long, name string, v double"
    )
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", "true").csv(csv_path)
    df.write.json(json_path)
    back_csv = sources.read_csv(spark, csv_path, schema="id long, name string, v double")
    back_json = sources.read_json(spark, json_path, schema="id long, name string, v double")
    assert sorted(r["id"] for r in back_csv.collect()) == [1, 2]
    assert sorted(r["v"] for r in back_json.collect()) == [1.5, 2.5]


def test_partitioned_parquet_write_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("a", "b") for i in range(5)],
        schema="dt string, id long, v double",
    )
    out = str(tmp_path / "p")
    sources.write_parquet(df, out, partition_by=["dt"])
    back = sources.read_parquet(spark, out).filter(F.col("dt") == "a")
    assert back.count() == 5
    # partition pruning: only the dt=a directory is in the scan
    plan = plans.physical_plan(back)
    assert "dt=b" not in plan
