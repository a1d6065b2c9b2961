"""Bitwise probe: where do Spark and DuckDB disagree on temporal_entropy?

Compares the round(,6) gate values EXACTLY (as the driver's value-hash does),
and for mismatching rows prints the pre-round values from both engines to
identify the divergence source (log2 ulp vs accumulation order).
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark.sources.tables import TABLES


def bits(x):
    if x is None:
        return None
    return struct.pack("<d", x).hex()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    duck_maps = []
    spark_maps = []
    for run in range(n_runs):
        sdf = qs["temporal_entropy"](spark, sf_dir)
        srows = {(r["time_id"], r["unit_id"]): r["value"] for r in sdf.collect()}
        cur = con.execute(oracles["temporal_entropy"])
        cols = [d[0] for d in cur.description]
        drows = {}
        for r in cur.fetchall():
            d = dict(zip(cols, r))
            drows[(d["time_id"], d["unit_id"])] = d["value"]
        spark_maps.append(srows)
        duck_maps.append(drows)
        mism = [
            k for k in srows
            if struct.pack("<d", srows[k]) != struct.pack("<d", drows[k])
        ]
        print(f"run {run}: spark-vs-duck exact mismatches: {len(mism)}")
        for k in mism[:5]:
            print(f"   {k}: spark={srows[k]!r} ({bits(srows[k])}) duck={drows[k]!r} ({bits(drows[k])})")

    # run-to-run determinism within each engine
    for name, maps in (("spark", spark_maps), ("duck", duck_maps)):
        base = maps[0]
        for i, m in enumerate(maps[1:], 1):
            diff = [k for k in base if struct.pack("<d", base[k]) != struct.pack("<d", m[k])]
            if diff:
                print(f"{name} run0 vs run{i}: {len(diff)} internal diffs, e.g. {diff[:3]}")
        else:
            print(f"{name}: checked {len(maps)} runs for internal determinism")


if __name__ == "__main__":
    main()
