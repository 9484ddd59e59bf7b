#!/bin/bash
# r18 quiet-box 3-tree paired bench (r17 verdict item #1).
# Runs bench.py from frozen worktrees of fff6162 (r16 close),
# 41d8324 (r17 start) and d35ab62 (r17 HEAD), alternating tree order
# between rounds, loadavg stamped by bench.py itself. Each invocation
# is a fresh process/JVM. Outputs land in bench_ab_r18/.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
OUT=/root/repo/bench_ab_r18
mkdir -p "$OUT"
run_one() {
  local tree="$1" round="$2" dir="$3"
  echo "=== round $round tree $tree $(date -u +%H:%M:%S) loadavg $(cut -d' ' -f1-3 /proc/loadavg) ===" >> "$OUT/log.txt"
  (cd "$dir" && timeout 1800 python bench.py > "$OUT/${tree}_round${round}.stdout" 2> "$OUT/${tree}_round${round}.stderr")
  cp "$dir/bench_out.json" "$OUT/${tree}_round${round}.json" 2>/dev/null
  echo "=== done $tree round $round rc=$? $(date -u +%H:%M:%S) ===" >> "$OUT/log.txt"
}
# round 1: oldest -> newest; round 2: newest -> oldest
run_one r16 1 /root/wt/r16
run_one r17start 1 /root/wt/r17start
run_one r17head 1 /root/wt/r17head
run_one r17head 2 /root/wt/r17head
run_one r17start 2 /root/wt/r17start
run_one r16 2 /root/wt/r16
echo "ALL DONE $(date -u)" >> "$OUT/log.txt"
