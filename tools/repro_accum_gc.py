"""Minimal repro for the DAGScheduler 'non-existent accumulator' ERROR
that sat unexplained in BENCH_r09.json's stderr tail (VERDICT r9 #2).

Root cause (r10): `panel.materialize` used `localCheckpoint(eager=False)`.
A lazily-checkpointed panel is shared by CONCURRENT jobs — Spark runs
broadcast-distinct subqueries (the panel's time/unit axes) as separate
jobs racing the main query job. Whichever job finishes first triggers
`RDD.doCheckpoint` -> `markCheckpointed()`, which truncates lineage and
drops the only strong references to the upstream stages' SQLMetric
accumulators (AccumulatorContext holds weak refs). The next JVM GC
collects them while the OTHER job's tasks are still in flight; when
those tasks complete, DAGScheduler.updateAccumulators finds the ids
gone and logs `ERROR DAGScheduler: Failed to update accumulator N`
plus `WARN AccumulatorContext: Attempted to access garbage collected
accumulator N`. Purely cosmetic: the accumulators are UI metrics; data
flow, results and timings are unaffected (all gates green throughout).
The companion `WARN BlockManager: Block rdd_N already exists` is the
same race — both jobs computed the checkpoint partition.

Verification (this script): entry flagship on a vanilla local[4] session —
  SPARK_GRAFT_EAGER_MAT=0 python tools/repro_accum_gc.py   # lazy: ~50 ERRORs
  python tools/repro_accum_gc.py                            # eager: 0 ERRORs
(lazy is a GC-timing RACE — a JVM GC must land inside the
truncation-to-task-completion window, so some lazy runs show 0; eager
is structurally immune, 0 across every observed run)
Eager materialization runs a dedicated blocking job whose tasks all
complete BEFORE the truncation, so no in-flight task references
pre-truncation lineage. The r10 counterbalanced ABBA (9 panel-heavy
bench queries, sf0.1) measured lazy 12.551 s vs eager 12.612 s — a wash —
so eager is the default since r10 (BENCH_NOTES_r10.md).
"""
import sys

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").getOrCreate()
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

rows = len(e.entry(spark).collect())
print(f"rows={rows}  (count 'ERROR DAGScheduler' lines on stderr)")
