"""Synthesize a larger scale factor from the driver's sf0.1 testdata
(VERDICT r5 #1 — the >=10x scale datapoint). Writes to an output dir
inside the repo (testdata itself is read-only).

Tiling rules, chosen so every query's semantics scale the way a real 10x
corpus would:

- events: TIME-tiled (ts + t*30 days, contiguous 300-day axis; the unit
  axis is unchanged so the spatial grid geometry — and the grid weight
  table — stays fixed while panels/window ops see 10x history). Tiling
  the unit axis instead would 10x the quadtree (a different, also valid,
  stress — time keeps the gapless-axis contract the tree family checks).
- documents: doc_id-offset tiles; tile t>=1 deterministically perturbs
  ~20% of words (hash-selected, '~t' suffix) so cross-tile texts are NOT
  near-duplicates (verbatim tiling would hand every doc 9 artificial
  near-dup partners and push pair counts quadratic); within-tile
  duplicate structure is preserved exactly. n_chars recomputed.
- embeddings: FRESH unit-normalized gaussian vectors per tile (the base
  corpus's >=0.45-cosine pairs are the random tail, 144 in 2e6 — fresh
  draws reproduce that density naturally); labels copied.
- TPC-H tables: key-offset tiles with referential integrity preserved
  (orderkey/custkey/partkey/suppkey all shift together); dates/values
  copied so filter selectivities — and therefore per-query work — scale
  linearly. region/nation stay fixed (dimensions).

Usage: python tools/gen_sf.py [factor] [base_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 <repo>/.sfdata/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = {  # base-table sizes at sf0.1 (key offsets per tile)
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".sfdata", "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tiles = list(range(factor))

    def src(t: str) -> str:
        return f"read_parquet('{base}/{t}.parquet')"

    def write(name: str, union_sql: str) -> None:
        # ~64 row groups per table (floor 2048 rows): a single-row-group
        # file is unsplittable, so every narrow stage over it runs ONE
        # task regardless of cores — the opposite of how a real large
        # table behaves. duckdb's default (122880) left sf1 documents and
        # embeddings as one group each, serializing the corpus scans.
        rows = con.sql(f"SELECT count(*) FROM ({union_sql})").fetchone()[0]
        rg = max(2048, rows // 64)
        con.execute(
            f"COPY ({union_sql}) TO '{out}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    write("customer", " UNION ALL ".join(
        f"SELECT c_custkey + {t * N['customer']} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal, c_mktsegment FROM {src('customer')}" for t in tiles))
    write("supplier", " UNION ALL ".join(
        f"SELECT s_suppkey + {t * N['supplier']} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal FROM {src('supplier')}" for t in tiles))
    write("part", " UNION ALL ".join(
        f"SELECT p_partkey + {t * N['part']} AS p_partkey, p_name, p_brand, p_type,"
        f" p_size, p_retailprice FROM {src('part')}" for t in tiles))
    write("orders", " UNION ALL ".join(
        f"SELECT o_orderkey + {t * N['orders']} AS o_orderkey,"
        f" o_custkey + {t * N['customer']} AS o_custkey, o_orderstatus, o_totalprice,"
        f" o_orderdate, o_orderpriority FROM {src('orders')}" for t in tiles))
    write("lineitem", " UNION ALL ".join(
        f"SELECT l_orderkey + {t * N['orders']} AS l_orderkey,"
        f" l_partkey + {t * N['part']} AS l_partkey,"
        f" l_suppkey + {t * N['supplier']} AS l_suppkey,"
        f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        f" l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}" for t in tiles))
    write("events", " UNION ALL ".join(
        f"SELECT event_id + {t * N['events']} AS event_id,"
        f" ts + INTERVAL {t * 30} DAY AS ts, user_id, event_type, value, props"
        f" FROM {src('events')}" for t in tiles))

    doc_selects = [f"SELECT doc_id, text, lang, source, n_chars FROM {src('documents')}"]
    for t in tiles[1:]:
        perturbed = (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"w -> CASE WHEN hash(w || '/{t}') % 5 = 0 THEN w || '~{t}' ELSE w END), ' ')"
        )
        doc_selects.append(
            f"SELECT doc_id + {t * N['documents']} AS doc_id, {perturbed} AS text,"
            f" lang, source, length({perturbed})::BIGINT AS n_chars FROM {src('documents')}"
        )
    write("documents", " UNION ALL ".join(doc_selects))

    base_emb = pq.read_table(f"{base}/embeddings.parquet")
    labels = np.asarray(base_emb["label"].to_pylist(), dtype=np.int32)
    vecs0 = np.asarray(base_emb["embedding"].to_pylist(), dtype=np.float32)
    nbase, dim = vecs0.shape
    parts = [base_emb]
    for t in tiles[1:]:
        rng = np.random.default_rng(961_748_927 + t)
        x = rng.standard_normal((nbase, dim))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        x = x.astype(np.float32)
        parts.append(pa.table({
            "vec_id": pa.array(np.arange(nbase, dtype=np.int64) + t * N["embeddings"]),
            "embedding": pa.array(list(x), type=base_emb.schema.field("embedding").type),
            "label": pa.array(labels, type=base_emb.schema.field("label").type),
        }, schema=base_emb.schema))
    emb = pa.concat_tables(parts)
    pq.write_table(
        emb, f"{out}/embeddings.parquet",
        row_group_size=max(512, emb.num_rows // 64),
    )
    print(f"embeddings: {emb.num_rows} rows")


if __name__ == "__main__":
    main()
