"""Fit per-query log-log scaling exponents from bench JSON lines.

Usage: python tools/fit_scaling.py out.json sf1=BENCH_SF1_r09.json sf3=/tmp/x.json ...
Each input is a bench.py protocol line {"queries": {...}, "sf": N}. The
key (sf0.1/sf1/sf3/sf5) maps to the corpus multiplier vs sf0.1 = 1.
Exponent = OLS slope of log(wall) on log(multiplier) — wall ∝ data^e.
"""

from __future__ import annotations

import json
import math
import sys

MULT = {"sf0.1": 1.0, "sf1": 10.0, "sf3": 30.0, "sf5": 50.0}


def main() -> None:
    out_path = sys.argv[1]
    points: dict[str, dict[float, float]] = {}
    for spec in sys.argv[2:]:
        name, path = spec.split("=", 1)
        q = json.load(open(path))["queries"]
        for k, v in q.items():
            points.setdefault(k, {})[MULT[name]] = v
    fits = {}
    for k, pts in sorted(points.items()):
        if len(pts) < 2:
            continue
        xs = [math.log(m) for m in sorted(pts)]
        ys = [math.log(pts[m]) for m in sorted(pts)]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        fits[k] = {
            "exponent": round(slope, 3),
            "points": {str(m): pts[m] for m in sorted(pts)},
            # pairwise local exponents expose where the curve bends
            "local": {
                f"{a}->{b}": round(
                    math.log(pts[b] / pts[a]) / math.log(b / a), 3
                )
                for a, b in zip(sorted(pts), sorted(pts)[1:])
            },
        }
    json.dump(fits, open(out_path, "w"), indent=1)
    for k, f in fits.items():
        print(f"{k:24s} e={f['exponent']:6.3f}  local={f['local']}")


if __name__ == "__main__":
    main()
