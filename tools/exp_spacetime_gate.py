"""ABBA A/B: spacetime_distances per-slice driver path vs the staged
block-pruned path, at a given sf dir.

Why (r9 scale sweep): the per-slice path computes each time slice
against ALL events at t' <= t, so its total work is sum_t E_t ~ E*T/2 —
QUADRATIC in the time axis when events grow with history (the sf tiling
is time-tiled). The staged path's time band prunes candidates to a
bounded window, so its work is linear in T. But the gate picks the
per-slice path on an ABSOLUTE event count (n_events <= 50k), which stays
under cap as T grows — the gate selects the quadratic path exactly when
it loses. This tool measures both paths (same session, A B B A,
first-round discarded, full checksummed evaluation) to locate the real
crossover and validate a work-based gate.

Outputs parity too: the two paths are exact and must hash-identically.

Usage: python tools/exp_spacetime_gate.py [sf_dir] [--rounds=N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from views_transformation_library_spark.operators import spacetime
from views_transformation_library_spark.session import get_spark


def checksum(df):
    cols = ", ".join(f"`{c}`" for c in df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = 2
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
    spark = get_spark("exp_spacetime_gate")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).withColumn("k", F.col("id") % 64).groupBy("k").applyInPandas(
        lambda p: p, schema="id long, k long"
    ).count()

    def run(cap):
        panel = entry._event_panel(spark, sf_dir)
        q = entry._r6(spacetime.spacetime_distances(
            panel, "distances", k=2, nu=1.0, stride=entry.GRID_STRIDE,
            driver_cap=cap,
        ))
        t0 = time.monotonic()
        nrows, h = checksum(q)
        return time.monotonic() - t0, nrows, h

    times = {"slice": [], "staged": []}
    hashes = {}
    for r in range(rounds):
        for name, cap in (("slice", spacetime.DENSE_DRIVER_CAP), ("staged", 0),
                          ("staged", 0), ("slice", spacetime.DENSE_DRIVER_CAP)):
            sec, nrows, h = run(cap)
            hashes.setdefault(name, h)
            assert hashes[name] == h
            if r > 0:
                times[name].append(sec)
            print(f"# round {r} arm={name} {sec:.3f}s rows={nrows} h={h}",
                  file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "rounds_kept": rounds - 1,
        "slice_min_s": round(min(times["slice"]), 3),
        "staged_min_s": round(min(times["staged"]), 3),
        "staged_over_slice": round(min(times["staged"]) / min(times["slice"]), 3),
        "hash_equal": hashes["slice"] == hashes["staged"],
        "slice_all": [round(t, 3) for t in times["slice"]],
        "staged_all": [round(t, 3) for t in times["staged"]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
