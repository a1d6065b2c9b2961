"""Wide-table grade for profile_sketch (VERDICT r12 #4).

The register pass explodes each scan row into |cols| (column, hash)
entries, so the work SHOULD be linear in |cols| at fixed rows (the
shuffle stays O(|cols|·m)). Today's gate evidence covers 2–4 columns;
this measures 2/4/8/16-column profiles at a given SF and fits the
cols-scaling exponent, so "linear in cols" is a measurement instead of
a plan-shape argument.

Protocol: bench.py discipline — full evaluation (count + bit_xor
(xxhash64) over every output column), min-of-N runs per point, one
warm-up job first.

Usage: python tools/exp_profile_sketch_cols.py <sf_dir> [--runs 3]
       [--json=out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from views_transformation_library_spark.operators import profiling
from views_transformation_library_spark.session import get_spark

# the synthetic lineitem has 11 columns; the 16-wide point adds 5
# derived integer columns (modular projections — same hash cost class
# as the real keys). The 2-column prefix matches the committed gate
# subjects.
COLS16 = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus",
    "d_mod97", "d_mod101", "d_mod89", "d_mod83", "d_mod79", "d_mod73",
]
DERIVED = {
    "d_mod97": 97, "d_mod101": 101, "d_mod89": 89, "d_mod83": 83,
    "d_mod79": 79, "d_mod73": 73,
}
WIDTHS = [2, 4, 8, 16]
P = 12


def _evaluate(df) -> int:
    agg = [F.count(F.lit(1)).alias("__n")] + [
        F.bit_xor(F.xxhash64(F.col(c).cast("string"))).alias(f"__h{i}")
        for i, c in enumerate(df.columns)
    ]
    row = df.agg(*agg).collect()[0]
    return int(row["__n"])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = 3
    out_path = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--runs":
            runs = int(argv[i + 1])
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]

    spark = get_spark("exp_profile_sketch_cols")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for name, mod in DERIVED.items():
        li = li.withColumn(name, F.col("l_orderkey") % mod)
    n_rows = li.count()  # warm-up + the fixed-rows denominator

    points: dict[int, dict] = {}
    for width in WIDTHS:
        cols = COLS16[:width]
        best, out_rows = None, 0
        for _ in range(runs):
            t0 = time.time()
            out_rows = _evaluate(profiling.profile_sketch(li, cols, p=P))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        points[width] = {"wall_sec": round(best, 3), "out_rows": out_rows}
        print(f"# cols={width}: {best:.3f}s ({out_rows} rows)", file=sys.stderr)

    # log-log fit of wall vs cols across the measured widths
    xs = [math.log(wd) for wd in WIDTHS]
    ys = [math.log(points[wd]["wall_sec"]) for wd in WIDTHS]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    doc = {
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "p": P,
        "runs": runs,
        "points": points,
        "cols_exponent": round(slope, 3),
        "linear_in_cols": slope <= 1.15,
    }
    text = json.dumps(doc, indent=2)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
