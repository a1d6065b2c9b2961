"""Scaling-ratio table between two bench runs of the SAME code at two
scale factors (VERDICT r5 #1): per-query wall-time ratios, with the data
ratio as the linear-scaling reference. Emits markdown.

Usage: python tools/scaling_table.py small.json big.json [data_ratio]
Accepts either raw bench.py JSON lines or the driver's wrapped artifact
({"parsed": {...}}).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def main() -> None:
    small, big = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in qs:
        if name in qb and qs[name] and qb[name]:
            rows.append((name, qs[name], qb[name], qb[name] / qs[name]))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {small.get('sf', '?')} s | {big.get('sf', '?')} s | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in rows:
        flag = " ⚠" if r > data_ratio * 1.5 else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    tot_a = sum(a for _, a, _, _ in rows)
    tot_b = sum(b for _, _, b, _ in rows)
    print(f"| **total ({len(rows)} common)** | {tot_a:.1f} | {tot_b:.1f} | "
          f"{tot_b / tot_a:.1f}x |")


if __name__ == "__main__":
    main()
