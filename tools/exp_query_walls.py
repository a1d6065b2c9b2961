"""Wall-clock profile for ARBITRARY queries() entries (the ones outside
bench.py's HEADLINE set) — same protocol as bench.py: min-of-N full
evaluations (count + bit_xor(xxhash64) over every output column so
Catalyst can't prune the expressions under test).

Usage:
  python tools/exp_query_walls.py <sf_dir> name1,name2,... [--runs 3] [--json out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from views_transformation_library_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, names = args[0], args[1].split(",")
    runs = 3
    out_path = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--runs":
            runs = int(argv[i + 1])
        if a == "--json":
            out_path = argv[i + 1]

    import __spark_entry__ as entrymod

    spark = get_spark()
    qs = entrymod.queries()
    # warm the JVM/python-worker pools the way bench.py does
    spark.range(1_000_000).selectExpr("id % 97 as k", "id as v").groupBy(
        "k"
    ).count().collect()

    timings: dict[str, float] = {}
    for name in names:
        best, n_rows = None, 0
        for _ in range(runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            cols = ", ".join(f"`{c}`" for c in df.columns)
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor(xxhash64({cols}))").alias("checksum"),
            ).collect()[0]
            elapsed = round(time.time() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
            n_rows = row["n"]
        timings[name] = best
        print(f"# {name}: {best:.3f}s ({n_rows} rows)", file=sys.stderr)
    doc = {"sf_dir": sf_dir, "runs": runs, "queries": timings}
    text = json.dumps(doc, indent=2)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
