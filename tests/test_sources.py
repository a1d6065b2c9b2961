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


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key into the same bucket count must
    sort-merge-join with no Exchange on either side — the co-location
    contract write_bucketed exists for."""
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    sources.write_bucketed(left, "t_bl", 4, ["k"], sort_by=["k"],
                           path=str(tmp_path / "bl"))
    sources.write_bucketed(right, "t_br", 4, ["k"], sort_by=["k"],
                           path=str(tmp_path / "br"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_bl").join(spark.table("t_br"), "k")
            plan = plans.physical_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # groupBy on the bucket key also skips its shuffle
        agg = spark.table("t_bl").groupBy("k").agg(F.sum("a"))
        assert "Exchange" not in plans.physical_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bl")
        spark.sql("DROP TABLE IF EXISTS t_br")


def test_range_sorted_layout_has_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted: every parquet file covers a disjoint range of
    the layout column (parquet min/max stats then skip files for range
    predicates), and rows are sorted within each file."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(10_000).selectExpr(
        "id % 500 as time_id", "id as unit_id", "cast(id as double) as value"
    )
    path = str(tmp_path / "ranged")
    sources.write_range_sorted(df, path, "time_id", 8, secondary_sort=["unit_id"])
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        t = pq.read_table(f, columns=["time_id"])["time_id"].to_pylist()
        if t:
            assert t == sorted(t)  # sorted within file
            spans.append((min(t), max(t)))
    assert len(spans) >= 4  # really range-partitioned, not one file
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint up to boundary duplicates
    # full fidelity
    assert spark.read.parquet(path).count() == 10_000


def _py_morton(vals, bits):
    z = 0
    k = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * k + j)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 17, 65535, 70000) for y in (0, 1, 5, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = sources.zorder_key(df, ["x", "y"], bits=16).collect()
    for r in out:
        assert r["zorder"] == _py_morton([r["x"], r["y"]], 16)


def test_zorder_key_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds 62"):
        sources.zorder_key_sql(["a", "b", "c", "d"], bits=16)
    with _pytest.raises(ValueError, match="at least one"):
        sources.zorder_key_sql([], bits=8)


def test_write_zordered_files_are_tight_on_both_dims(spark, tmp_path):
    """Z-order layout: each file's bounding box covers a small fraction of
    the (x, y) domain on BOTH dimensions — a single-column sort can only be
    tight on its own column."""
    import glob

    import pyarrow.parquet as pq

    n = 1 << 12
    # x ~ row-major, y ~ bit-reversed x: decorrelated uniform grid
    df = spark.range(n).selectExpr(
        "id % 64 as x", "cast(conv(reverse(lpad(bin(id % 64), 6, '0')), 2, 10) as long) as y",
        "id as payload"
    )
    path = str(tmp_path / "zord")
    sources.write_zordered(df, path, ["x", "y"], bits=6, n_partitions=16)
    areas = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        if xs:
            areas.append(
                (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1) / (64.0 * 64.0)
            )
    assert len(areas) >= 8
    # average bounding-box area well under the full domain; random layout -> ~1.0
    assert sum(areas) / len(areas) < 0.5
    assert spark.read.parquet(path).count() == n


def test_read_parquet_pruned_skips_files(spark, tmp_path):
    df = spark.range(10_000).selectExpr(
        "id % 500 as time_id", "id as unit_id", "cast(id as double) as value"
    )
    path = str(tmp_path / "pruned")
    sources.write_range_sorted(df, path, "time_id", 8, secondary_sort=["unit_id"])
    stats = {}
    from views_transformation_library_spark.sources import read_parquet_pruned

    out = read_parquet_pruned(spark, path, "time_id", lo=100, hi=120, stats=stats)
    assert stats["files_total"] >= 4
    assert stats["files_scanned"] < stats["files_total"]  # real skipping
    expected = df.filter("time_id between 100 and 120")
    assert out.count() == expected.count()
    assert out.agg(F.sum("unit_id")).collect()[0][0] == \
        expected.agg(F.sum("unit_id")).collect()[0][0]
    # empty range: no files, schema preserved
    none = read_parquet_pruned(spark, path, "time_id", lo=10_000, stats={})
    assert none.count() == 0 and set(none.columns) == {"time_id", "unit_id", "value"}
