#!/bin/bash
# Round-3 remaining artifacts (headline + fp12 already recorded in
# BENCH_SUITE.jsonl). Priority order so a wall-clock cutoff still leaves
# the most valuable lines recorded. Appends to BENCH_SUITE.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_SUITE.jsonl}

run() {
  local tag="$1"; shift
  local env_vars="$1"; shift
  echo "=== $tag (env: ${env_vars:-none}) $(date -u +%H:%M:%S)" >&2
  local log="/tmp/bench_${tag}.log"
  local t0=$SECONDS
  env $env_vars timeout 3000 python bench.py "$@" >"$log" 2>&1
  local rc=$?
  local wall=$((SECONDS - t0))
  local json
  json=$(grep -h '^{' "$log" | tail -1)
  if [ $rc -eq 0 ] && [ -n "$json" ]; then
    echo "$json" | python -c "
import json,sys
d = json.loads(sys.stdin.read())
d['config'] = '$tag'
d['wall_s'] = $wall
print(json.dumps(d))" >> "$OUT"
  else
    echo "{\"config\": \"$tag\", \"rc\": $rc, \"wall_s\": $wall, \"error\": \"see $log\"}" >> "$OUT"
  fi
  tail -3 "$log" >&2
}

# 1. configs 4/5 machinery on the real chip (the design's showcase:
#    ONE shared final exp)
run "fused_B8192" "" --mode fused
run "sharded_B8192" "" --mode sharded
# 2. scaling report (writes SCALING.md)
echo "=== scaling_report $(date -u +%H:%M:%S)" >&2
timeout 3000 python tools/scaling_report.py 4096 > /tmp/scaling_report_r3.log 2>&1
echo "scaling rc=$?" >&2
grep -h '^{' /tmp/scaling_report_r3.log | tail -1 >> "$OUT" || true
# 3. fusion A/B at the headline batch
run "indep_fusedonly_B4096" "BN254_DISABLE_UNROLL=1" --batch 4096
run "indep_xlaonly_B4096" "BN254_DISABLE_UNROLL=1 BN254_DISABLE_FUSED=1" --batch 4096
# 4. batch sweep for the winner
run "indep_unroll_B1024" "" --batch 1024
run "indep_unroll_B16384" "" --batch 16384
# 5. fold-mul MXU A/B
echo "=== ab_fold_mul $(date -u +%H:%M:%S)" >&2
timeout 3000 python tools/ab_fold_mul.py > /tmp/ab_fold_mul.log 2>&1
echo "fold rc=$?" >&2

echo "suite done $(date -u +%H:%M:%S)" >&2
