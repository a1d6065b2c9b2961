"""One-off parity smoke for the sketches module vs hand-written DuckDB
mirrors at sf0.01 — run before wiring the entry oracles."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark.operators import sketches

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark()
con = duckdb.connect()
li = spark.read.parquet(f"{SF}/lineitem.parquet")
docs = spark.read.parquet(f"{SF}/documents.parquet")
orders = spark.read.parquet(f"{SF}/orders.parquet")
cust = spark.read.parquet(f"{SF}/customer.parquet")


def cmp(name, sdf, sql, sort_cols):
    a = [tuple(r) for r in sdf.orderBy(*sort_cols).collect()]
    b = con.execute(sql).fetchall()
    ok = a == b
    print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(a)} rows)")
    if not ok:
        for x, y in list(zip(a, b))[:5]:
            if x != y:
                print("  spark:", x, "\n  duck :", y)
        print("  lens", len(a), len(b))
    return ok


P, M = 8, 256
BW, K = 60 - P, 61 - P
ALPHA_NUM = repr(sketches.hll_alpha(M) * M * M * float(1 << K))
hll_sql = f"""
WITH h AS (
  SELECT l_returnflag AS g,
         CAST('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,15) AS BIGINT) AS h
  FROM read_parquet('{SF}/lineitem.parquet')
), r AS (
  SELECT g, h % {M} AS idx,
         CASE WHEN h // {M} = 0 THEN {K}
              ELSE {BW} - length(bin(h // {M})) + 1 END AS rho
  FROM h
), regs AS (SELECT g, idx, max(rho) AS m FROM r GROUP BY 1, 2),
agg AS (
  SELECT g, count(*) AS nreg,
         sum((CAST(1 AS BIGINT) << ({K} - m)))::BIGINT AS sp
  FROM regs GROUP BY 1
)
SELECT g, CAST({M} - nreg AS INT) AS n_zero,
       (sp + ({M} - nreg) * {1 << K})::BIGINT AS s_scaled,
       round(CAST({ALPHA_NUM} AS DOUBLE)
             / CAST(sp + ({M} - nreg) * {1 << K} AS DOUBLE), 6) + 0.0 AS estimate
FROM agg ORDER BY g
"""
cmp("hll", sketches.hll_distinct(li, "l_partkey", ["l_returnflag"], p=P),
    hll_sql, ["l_returnflag"])
# sanity: estimate vs exact
ex = dict(con.execute(
    f"SELECT l_returnflag, count(DISTINCT l_partkey) FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
).fetchall())
for row in sketches.hll_distinct(li, "l_partkey", ["l_returnflag"], p=P).collect():
    g = row["l_returnflag"]
    print(f"  hll {g}: est={row['estimate']:.0f} exact={ex[g]} err={row['estimate']/ex[g]-1:+.2%}")

KM = 128
kmv_sql = f"""
WITH h AS (
  SELECT DISTINCT l_returnflag AS g,
         CAST('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,15) AS BIGINT) AS h
  FROM read_parquet('{SF}/lineitem.parquet')
), rk AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h
), agg AS (
  SELECT g, CAST(max(rn) AS INT) AS n_min, max(h) AS kth_hash
  FROM rk WHERE rn <= {KM} GROUP BY g
)
SELECT g, n_min, kth_hash,
       round(CASE WHEN n_min < {KM} THEN CAST(n_min AS DOUBLE)
             ELSE CAST({repr(float(KM - 1) * float(1 << 60))} AS DOUBLE)
                  / CAST(kth_hash AS DOUBLE) END, 6) + 0.0 AS estimate
FROM agg ORDER BY g
"""
cmp("kmv", sketches.kmv_distinct(li, "l_partkey", k=KM, group_cols=["l_returnflag"]),
    kmv_sql, ["l_returnflag"])
for row in sketches.kmv_distinct(li, "l_partkey", k=KM, group_cols=["l_returnflag"]).collect():
    g = row["l_returnflag"]
    print(f"  kmv {g}: est={row['estimate']:.0f} exact={ex[g]} err={row['estimate']/ex[g]-1:+.2%}")

ITEMS = ["the", "a", "of", "and", "data", "model", "x", "q", "zzznope", "test"]
D, W = 4, 1024
items_sql = ", ".join(f"('{i}')" for i in ITEMS)
cm_sql = f"""
WITH tk AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM read_parquet('{SF}/documents.parquet')
), rows_ AS (
  SELECT t, unnest(generate_series(0, {D - 1})) AS d FROM tk
), sk AS (
  SELECT d, CAST(CAST('0x'||substr(md5('cm'||d||':'||t),1,15) AS BIGINT) % {W} AS INT) AS bucket,
         count(*) AS c
  FROM rows_ GROUP BY 1, 2
), it(item) AS (VALUES {items_sql}),
pr AS (
  SELECT item, d,
         CAST(CAST('0x'||substr(md5('cm'||d||':'||item),1,15) AS BIGINT) % {W} AS INT) AS bucket
  FROM it, generate_series(0, {D - 1}) AS gs(d)
)
SELECT item, min(coalesce(c, 0))::BIGINT AS est_count
FROM pr LEFT JOIN sk USING (d, bucket) GROUP BY 1 ORDER BY item
"""
toks = docs.select(
    F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias("t")
)
cmp("cm", sketches.cm_estimate(toks, "t", ITEMS, depth=D, width=W), cm_sql, ["item"])
exact_tok = dict(con.execute(f"""
  SELECT t, count(*) FROM (SELECT unnest(regexp_extract_all(lower(text),'[a-z0-9]+')) AS t
  FROM read_parquet('{SF}/documents.parquet')) GROUP BY 1
""").fetchall())
for row in sketches.cm_estimate(toks, "t", ITEMS, depth=D, width=W).collect():
    print(f"  cm {row['item']}: est={row['est_count']} exact={exact_tok.get(row['item'], 0)}")

NB, NH = 1 << 17, 5
bloom_sql = f"""
WITH bpos AS (
  SELECT DISTINCT CAST('0x'||substr(md5('bf'||j||':'||CAST(o_custkey AS VARCHAR)),1,15) AS BIGINT) % {NB} AS pos
  FROM read_parquet('{SF}/orders.parquet'), generate_series(0, {NH - 1}) AS g(j)
), pk AS (SELECT DISTINCT c_custkey FROM read_parquet('{SF}/customer.parquet')),
ppos AS (
  SELECT c_custkey, CAST('0x'||substr(md5('bf'||j||':'||CAST(c_custkey AS VARCHAR)),1,15) AS BIGINT) % {NB} AS pos
  FROM pk, generate_series(0, {NH - 1}) AS g(j)
)
SELECT c_custkey,
       CAST(sum(CASE WHEN bpos.pos IS NOT NULL THEN 1 ELSE 0 END) = {NH} AS INT) AS bloom_hit
FROM ppos LEFT JOIN bpos ON ppos.pos = bpos.pos
GROUP BY 1 ORDER BY c_custkey
"""
cmp("bloom", sketches.bloom_prefilter(orders, "o_custkey", cust, "c_custkey",
                                      n_bits=NB, n_hashes=NH),
    bloom_sql, ["c_custkey"])
actual = dict(con.execute(f"""
  SELECT c_custkey, CAST(c_custkey IN (SELECT o_custkey FROM read_parquet('{SF}/orders.parquet')) AS INT)
  FROM read_parquet('{SF}/customer.parquet')
""").fetchall())
hits = {r["c_custkey"]: r["bloom_hit"]
        for r in sketches.bloom_prefilter(orders, "o_custkey", cust, "c_custkey",
                                          n_bits=NB, n_hashes=NH).collect()}
fn = sum(1 for k, a in actual.items() if a == 1 and hits[k] == 0)
fp = sum(1 for k, a in actual.items() if a == 0 and hits[k] == 1)
neg = sum(1 for a in actual.values() if a == 0)
print(f"  bloom: false_neg={fn} (must be 0), false_pos={fp}/{neg} negatives")
