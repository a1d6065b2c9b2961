"""Debug the single diverging grid_lag_multi row at sf0.1: (time 19736,
unit 884, feature a). Pull the per-mesh-box terms from BOTH engines and
find the first component that differs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import __spark_entry__ as e
from pyspark.sql import functions as F
from views_transformation_library_spark.session import get_spark
from views_transformation_library_spark.operators import trees
from views_transformation_library_spark import panel as P

SF = "/root/testdata/sf0.1"
T, U = 19736, 884

spark = get_spark("dbg")
e._ORACLE_SF_DIR = SF

# ---- Spark side: rebuild grid_lag_multi internals up to the pair terms
pn = e._panel2(spark, SF)
feats = ["a", "b"]
df = trees.materialize(pn)
pgids = tuple(sorted(r[0] for r in df.select(P.UNIT).distinct().collect()))
geo = trees._spatial_geometry_cached(pgids, e.GRID_STRIDE)
cells = trees._embedded_cells(df, geo, e.GRID_STRIDE, feats)
nodevals = trees._level_aggregates(
    cells, feats, list(range(geo.power + 1)), geo.power, decimal_exact=True
).localCheckpoint()
mesh = trees._grid_mesh(nodevals, "a", e.GRID_LAG_MULTI_THRESHOLD, geo)
targets = cells.select(P.TIME, P.UNIT, "__ex", "__ey").filter(
    (F.col(P.TIME) == T) & (F.col(P.UNIT) == U)
)
pairs = targets.join(mesh, F.col(P.TIME) == F.col("__mt")).filter(
    ~((F.col("__lvl") == geo.power) & (F.col("__bx") == F.col("__ex")) & (F.col("__by") == F.col("__ey")))
)
mx = F.col("__ex") * F.lit(2.0) + F.lit(1.0) - F.col("__cx") * F.lit(2.0)
my = F.col("__ey") * F.lit(2.0) + F.lit(1.0) - F.col("__cy") * F.lit(2.0)
pairs = pairs.withColumn("__k", (mx * mx + my * my).cast("long"))
wrows, scalar_names, _ = trees.grid_weight_rows(geo.ncells, {None: trees.GRID_DFUNCTIONS[0]})
wtab = spark.createDataFrame(wrows, "__k long, __d double, __w_0 double")
sp = (
    pairs.join(F.broadcast(wtab.drop("__d")), "__k")
    .select("__lvl", "__bx", "__by", "__val", "__k", "__w_0",
            (F.col("__val") * F.col("__w_0")).alias("term"))
    .orderBy("__lvl", "__bx", "__by")
    .collect()
)
print("spark pairs:", len(sp))
sp_map = {(r["__lvl"], r["__bx"], r["__by"]): (r["__val"], r["__k"], r["__w_0"], r["term"]) for r in sp}
ssum = sum(r["term"] for r in sp)  # reference only

# ---- DuckDB side: the oracle's mesh terms for the same cell
sql = e._grid_lag_oracle(e.GRID_LAG_MULTI_THRESHOLD, 0, feats=("a", "b"),
                          base=e.PANEL2_SQL, panel_cte="panel2")
# extract everything up to the agg CTE; rebuild a per-term query
head = sql.split("agg_a AS")[0].rstrip().rstrip(",")
kx = "(t.ex * 2.0 + 1.0 - m.cx * 2.0)"
ky = "(t.ey * 2.0 + 1.0 - m.cy * 2.0)"
q = head + f""",
terms AS (
  SELECT m.lvl, m.bx, m.by, m.val,
         CAST({kx} * {kx} + {ky} * {ky} AS BIGINT) AS k,
         w.w_, m.val * w.w_ AS term
  FROM cells t JOIN meshc_a m ON m.mt = t.time_id
  JOIN wtab w ON w.k = CAST({kx} * {kx} + {ky} * {ky} AS BIGINT)
  WHERE NOT (m.lvl = {geo.power} AND m.bx = t.ex AND m.by = t.ey)
    AND t.time_id = {T} AND t.unit_id = {U}
)
SELECT * FROM terms ORDER BY lvl, bx, by
"""
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
dk = con.execute(q).fetchall()
print("duck pairs:", len(dk))
dk_map = {(r[0], r[1], r[2]): (r[3], r[4], r[5], r[6]) for r in dk}

only_s = set(sp_map) - set(dk_map)
only_d = set(dk_map) - set(sp_map)
print("only in spark:", sorted(only_s)[:10])
print("only in duck:", sorted(only_d)[:10])
ndiff = 0
for key in sorted(set(sp_map) & set(dk_map)):
    a, b = sp_map[key], dk_map[key]
    if a != b:
        ndiff += 1
        if ndiff <= 10:
            print("DIFF", key, "spark", a, "duck", b)
print("matching keys with differing payloads:", ndiff)
print("spark naive sum", repr(ssum), " duck naive sum", repr(sum(r[6] for r in dk)))
