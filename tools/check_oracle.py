"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, schema (column names sorted),
and an order-insensitive value comparison (sorted rows, NaN==NaN, doubles
to 1e-9 relative). Usage:

    python tools/check_oracle.py [--strict] [--shard k/n] [sf_dir] [query ...]

``--strict`` compares doubles byte-exactly (IEEE bit pattern), mirroring the
driver's value-hash: it catches what isclose() hides — e.g. DuckDB's
``round()`` emitting ``-0.0`` where Spark emits ``+0.0`` (the r1
temporal_entropy red row was exactly this, not a float-sum flake).

``--shard k/n`` (r10, VERDICT r9 #3) runs only every n-th query starting
at k (0-based, registration order) so the full sf1 strict log — whose
quadratic DuckDB oracle sides made the single-session run impractical
(abandoned at 22/148 after ~26 min in r9) — splits across parallel
sessions. Merge the per-shard ``--json`` outputs with
tools/merge_oracle_shards.py; striped assignment balances the few heavy
oracles across shards.
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark.sources.tables import TABLES


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_key(row):
    return tuple((x is None, str(type(x).__name__), str(x)) for x in row)


def compare_rows(spark_rows, duck_rows, rel=1e-9, strict=False):
    if len(spark_rows) != len(duck_rows):
        return f"row count {len(spark_rows)} vs {len(duck_rows)}"
    a = sorted((tuple(norm_cell(c) for c in r) for r in spark_rows), key=rows_key)
    b = sorted((tuple(norm_cell(c) for c in r) for r in duck_rows), key=rows_key)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for ca, cb in zip(ra, rb):
            if ca is None and cb is None:
                continue
            if ca is None or cb is None:
                return f"row {i}: {ra} vs {rb}"
            if isinstance(ca, float) and isinstance(cb, float):
                if strict:
                    if struct.pack("<d", ca) != struct.pack("<d", cb):
                        return (
                            f"row {i} (strict): {ra} vs {rb} "
                            f"[{struct.pack('<d', ca).hex()} vs {struct.pack('<d', cb).hex()}]"
                        )
                elif not math.isclose(ca, cb, rel_tol=rel, abs_tol=1e-9):
                    return f"row {i}: {ra} vs {rb}"
            elif ca != cb:
                return f"row {i}: {ra} vs {rb}"
    return None


def main():
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    skip: set[str] = set()
    for a in list(argv):
        if a.startswith("--skip="):
            skip |= set(a.split("=", 1)[1].split(","))
            argv.remove(a)
    shard_k, shard_n = 0, 1
    for a in list(argv):
        if a.startswith("--shard"):
            spec = a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1]
            if "=" not in a:
                argv.remove(spec)
            argv.remove(a)
            shard_k, shard_n = (int(x) for x in spec.split("/"))
            assert 0 <= shard_k < shard_n, f"bad shard {spec}"
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results = {}
    spark = get_spark("oracle_check", cpus=8)
    con = duckdb.connect()
    # the in-memory default has NO temp directory, so DuckDB cannot spill
    # and the quadratic oracle joins (embedding_neardup all-pairs,
    # spacetime_weights theta-join) OOM at sf1 — give it one, and drop
    # insertion-order preservation (compare_rows sorts rows itself)
    # PER-PROCESS spill dir: concurrent shard runs sharing one
    # temp_directory corrupt each other's duckdb_temp_storage-*.tmp
    # (r12: shard 0's spacetime_weights died with an IO error reading a
    # spill block shard 1 had truncated)
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    con.execute("SET max_temp_directory_size='60GiB'")
    # hard memory ceiling so the quadratic oracle joins SPILL instead of
    # growing to the OS OOM killer (r10: the sf1 spacetime θ-join reached
    # 63 GB anon RSS and got the whole shard process killed when run
    # concurrently with other sessions; DuckDB's default limit is 80 % of
    # RAM and assumes it is alone on the box). Default 80GiB suits a SOLO
    # session (the fuzzy_dedup_keep sf1 oracle needs ~60+GB and overflows
    # the 60GiB spill cap if squeezed to 40GiB); parallel shard runs
    # should set SPARK_GRAFT_DUCK_MEM to RAM/shards.
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '80GiB')}'"
    )
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    # axis-dependent oracles (tree-lag VALUES tables, inlined centroids,
    # fourier/mice goldens) are generated from the ORACLE SF's data at
    # oracle_sql() call time; repoint them at the checked dir so the
    # strict pass works at sf0.1 too (the driver's own gate always runs
    # at the documented sf0.01 default)
    entrymod._ORACLE_SF_DIR = sf_dir
    oracles = entrymod.oracle_sql()
    failures = []
    for qi, (name, fn) in enumerate(qs.items()):
        if (only and name not in only) or name in skip:
            continue
        if qi % shard_n != shard_k:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = [[r[c] for c in s_cols] for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "spark_error", "err": str(e)[:300]}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "spark_rows": len(s_rows)}
            print(f"skip  {name}: no oracle (rows-only: {len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols_raw = [d[0] for d in cur.description]
            d_rows_raw = cur.fetchall()
        except Exception as e:
            failures.append(name)
            results[name] = {"status": "duckdb_error", "err": str(e)[:300]}
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        d_order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
        d_cols = [d_cols_raw[i] for i in d_order]
        d_rows = [[r[i] for i in d_order] for r in d_rows_raw]
        if s_cols != d_cols:
            failures.append(name)
            results[name] = {"status": "schema_mismatch", "spark": s_cols, "oracle": d_cols}
            print(f"FAIL  {name}: schema {s_cols} vs {d_cols}")
            continue
        err = compare_rows(s_rows, d_rows, strict=strict)
        if err:
            failures.append(name)
            results[name] = {"status": "value_mismatch", "err": err[:300]}
            print(f"FAIL  {name}: {err}")
        else:
            results[name] = {
                "status": "match_strict" if strict else "match",
                "rows": len(s_rows),
            }
            print(f"ok    {name}  ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "strict": strict, "results": results}, fh, indent=1)
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match the DuckDB oracle")


if __name__ == "__main__":
    main()
