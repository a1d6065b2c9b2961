"""Merge per-shard check_oracle --json outputs into one log (r10).

Usage: python tools/merge_oracle_shards.py out.json shard0.json shard1.json ...

Verifies the shards agree on sf_dir/strict, unions their results (a query
appearing in two shards must agree), and prints the same summary line
check_oracle prints, exiting non-zero on any failure status.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *shards = sys.argv[1:]
    merged: dict = {}
    meta = None
    for p in shards:
        with open(p) as fh:
            d = json.load(fh)
        if meta is None:
            meta = {"sf_dir": d["sf_dir"], "strict": d["strict"]}
        else:
            assert meta == {"sf_dir": d["sf_dir"], "strict": d["strict"]}, (
                f"shard {p} ran with different settings: {d['sf_dir']}/{d['strict']}"
            )
        for name, res in d["results"].items():
            if name in merged:
                assert merged[name] == res, f"shards disagree on {name}"
            merged[name] = res
    bad = [
        n for n, r in merged.items()
        if r["status"] not in ("match", "match_strict", "rows_only")
    ]
    rows_only = [n for n, r in merged.items() if r["status"] == "rows_only"]
    with open(out_path, "w") as fh:
        json.dump({**meta, "results": merged}, fh, indent=1)
    print(
        f"{len(merged)} queries merged from {len(shards)} shards: "
        f"{len(merged) - len(bad) - len(rows_only)} match, "
        f"{len(rows_only)} rows-only, {len(bad)} FAILURES"
    )
    if bad:
        print(f"FAILURES: {sorted(bad)}")
        sys.exit(1)
    print("all queries match the DuckDB oracle")


if __name__ == "__main__":
    main()
