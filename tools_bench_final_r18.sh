#!/bin/bash
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
OUT=/root/repo/bench_ab_r18
run_one() {
  local tree="$1" round="$2" dir="$3"
  echo "=== final round $round tree $tree $(date -u +%H:%M:%S) loadavg $(cut -d' ' -f1-3 /proc/loadavg) ===" >> "$OUT/final_log.txt"
  (cd "$dir" && timeout 1800 python bench.py > "$OUT/final_${tree}_r${round}.stdout" 2> "$OUT/final_${tree}_r${round}.stderr")
  cp "$dir/bench_out.json" "$OUT/final_${tree}_r${round}.json" 2>/dev/null
  echo "=== done $tree r$round $(date -u +%H:%M:%S) ===" >> "$OUT/final_log.txt"
}
run_one head 1 /root/repo
run_one r17head 1 /root/wt/r17head
run_one r17head 2 /root/wt/r17head
run_one head 2 /root/repo
echo FINAL_DONE $(date -u) >> "$OUT/final_log.txt"
