#!/bin/bash
# Counterbalanced A/B of the r14 batch-1 changes over the touched headline
# queries. A = working tree (HEAD + changes), B = committed baseline
# (bb400f7) via git stash. Order A B B A, one fresh bench child per arm
# (SPARK_GRAFT_BENCH_SESSIONS=1), 15 s settle between sessions.
set -e
cd /root/repo
Q="temporal_tree_lag,fuzzy_dedup_keep,pagerank,decontaminate,grid_lag,pq_topk"
export SPARK_GRAFT_BENCH_ONLY="$Q"
export SPARK_GRAFT_BENCH_SESSIONS=1
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
out=${1:-/tmp/r14_batch1_ab}
mkdir -p "$out"

run_arm () {  # $1 = arm name, $2 = output file
  python bench.py > "$2" 2>/dev/null
  tail -1 "$2"
}

for i in 1 2 3 4; do
  case $i in
    1|4) arm=A ;;
    2|3) arm=B ;;
  esac
  if [ "$arm" = B ]; then git stash -q; fi
  echo "=== session $i arm $arm"
  run_arm $arm "$out/s${i}_${arm}.json"
  if [ "$arm" = B ]; then git stash pop -q; fi
  sleep 15
done
