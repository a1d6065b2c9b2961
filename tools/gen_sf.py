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

Usage: python tools/gen_sf.py [factor] [base_dir] [out_dir] [--skew]
Defaults: 10 /root/testdata/sf0.1 <repo>/.sfdata/sf1

--skew (r8, VERDICT r6 #2): the benign tiling above deliberately avoids
cross-tile near-dups and clustered embeddings, so every skew guard has
only ever been FORCE-engaged. The skew variant (default out dir
.sfdata/sf1skew) reshapes the corpus the way real web-scale data is
shaped, so guards engage NATURALLY at production parameters:

- documents: ~12% of docs are replaced by zipfian NEAR-duplicate
  clusters (sizes 2100, 1050, 700, ... = 2100/rank for 10 ranks; each
  copy perturbs ~2% of the seed's words so the cluster survives exact
  dedup but pairs under MinHash). The top cluster alone yields ~2.2M
  verified pairs — past connected_components' 2M driver cap, so the
  DISTRIBUTED label-propagation path runs on real data.
- embeddings: ~30% of vectors concentrate in 6 tight direction clusters
  (center + sigma=0.01 jitter, normalized): IVF buckets of thousands of
  members make the cogrouped scorer's candidate-buffer prune
  (PRUNE_AT=262144) trip naturally, and recall on CLUSTERED data tests
  the auto_graph_params policy in its intended regime.
- events: ~30% of rows collapse onto 10 hot user_ids (zipf over the
  panel's unit axis) — groupBy/window skew for the panel operators.
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


ZIPF_CLUSTERS = [2100 // r for r in range(1, 11)]  # 2100, 1050, 700, ...
N_EMB_CLUSTERS = 6
EMB_CLUSTER_SIZES = [3000, 1500, 600, 400, 300, 200]
HOT_UNITS = 10
HOT_EVENT_FRAC = 0.3


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    factor = int(args[0]) if len(args) > 0 else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = args[2] if len(args) > 2 else os.path.join(
        REPO, ".sfdata", "sf1skew" if skew else "sf1"
    )
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

    if skew:
        apply_skew(con, out)


def _stable_pct(s: str) -> int:
    import zlib

    return zlib.crc32(s.encode("utf-8")) % 100


def apply_skew(con, out: str) -> None:
    """Rewrite documents/embeddings/events in-place with the zipfian
    shapes documented in the module docstring. Deterministic: fixed
    seeds, crc32-keyed selections (never python hash())."""
    import zlib

    # --- documents: zipfian near-dup clusters over the top doc_ids
    t = pq.read_table(f"{out}/documents.parquet")
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    srcs = t["source"].to_pylist()
    total = len(ids)
    n_vict = sum(ZIPF_CLUSTERS)
    # seeds: the first 10 base docs; victims: the last n_vict ids
    by_id = dict(zip(ids, range(len(ids))))
    order = sorted(ids)
    victims = order[-n_vict:]
    pos = 0
    for r, size in enumerate(ZIPF_CLUSTERS):
        seed_words = (texts[by_id[order[r]]] or "").split(" ")
        for i in range(size):
            words = [
                w + f"~d{r}x{i}"
                if zlib.crc32(f"{w}/{r}:{i}".encode()) % 50 == 0
                else w
                for w in seed_words
            ]
            j = by_id[victims[pos]]
            texts[j] = " ".join(words)
            langs[j] = langs[by_id[order[r]]]
            srcs[j] = "skew_cluster_%d" % r
            pos += 1
    t2 = pa.table(
        {
            "doc_id": pa.array(ids, type=t.schema.field("doc_id").type),
            "text": pa.array(texts, type=t.schema.field("text").type),
            "lang": pa.array(langs, type=t.schema.field("lang").type),
            "source": pa.array(srcs, type=t.schema.field("source").type),
            "n_chars": pa.array(
                [len(x or "") for x in texts], type=t.schema.field("n_chars").type
            ),
        },
        schema=t.schema,
    )
    pq.write_table(t2, f"{out}/documents.parquet",
                   row_group_size=max(2048, total // 64))
    print(f"documents: skewed — {n_vict} docs in {len(ZIPF_CLUSTERS)} "
          f"near-dup clusters (top {ZIPF_CLUSTERS[0]})")

    # --- embeddings: tight direction clusters over the top vec_ids
    t = pq.read_table(f"{out}/embeddings.parquet")
    vec_ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    rng = np.random.default_rng(271_828_183)
    centers = rng.standard_normal((N_EMB_CLUSTERS, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    order = np.argsort(vec_ids)
    pos = len(order) - sum(EMB_CLUSTER_SIZES)
    for c, size in enumerate(EMB_CLUSTER_SIZES):
        jit = rng.standard_normal((size, dim)) * 0.01
        x = centers[c][None, :] + jit
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        vecs[order[pos : pos + size]] = x.astype(np.float32)
        pos += size
    t2 = pa.table(
        {
            "vec_id": t["vec_id"],
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                type=t.schema.field("embedding").type,
            ),
            "label": t["label"],
        },
        schema=t.schema,
    )
    pq.write_table(t2, f"{out}/embeddings.parquet",
                   row_group_size=max(512, len(vec_ids) // 64))
    print(f"embeddings: skewed — {sum(EMB_CLUSTER_SIZES)} vectors in "
          f"{N_EMB_CLUSTERS} tight clusters (top {EMB_CLUSTER_SIZES[0]})")

    # --- events: collapse ~30% of rows onto 10 zipf-weighted hot units
    t = pq.read_table(f"{out}/events.parquet")
    eids = t["event_id"].to_pylist()
    users = t["user_id"].to_pylist()
    zipf_w = list(range(HOT_UNITS, 0, -1))  # 10, 9, ..., 1
    wsum = sum(zipf_w)
    cum = []
    acc = 0
    for w in zipf_w:
        acc += w
        cum.append(acc)
    n_hot = 0
    for i, eid in enumerate(eids):
        if _stable_pct(f"hot/{eid}") < int(HOT_EVENT_FRAC * 100):
            r = zlib.crc32(f"rank/{eid}".encode()) % wsum
            rank = next(j for j, cv in enumerate(cum) if r < cv)
            users[i] = rank + 1  # hot unit ids 1..10
            n_hot += 1
    cols = {name: t[name] for name in t.schema.names}
    cols["user_id"] = pa.array(users, type=t.schema.field("user_id").type)
    t2 = pa.table(cols, schema=t.schema)
    pq.write_table(t2, f"{out}/events.parquet",
                   row_group_size=max(2048, len(eids) // 64))
    print(f"events: skewed — {n_hot} of {len(eids)} rows on {HOT_UNITS} hot units")


if __name__ == "__main__":
    main()
