#!/bin/bash
# Sequential TPU benchmark suite: headline + A/B matrix + BASELINE metrics.
# Appends one JSON line per config to BENCH_SUITE.jsonl (plus a log per run).
# Usage: tools/run_bench_suite.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_SUITE.jsonl}

run() {
  local tag="$1"; shift
  local env_vars="$1"; shift
  echo "=== $tag (env: ${env_vars:-none}) $(date -u +%H:%M:%S)" >&2
  local log="/tmp/bench_${tag}.log"
  local t0=$SECONDS
  env $env_vars timeout 5400 python bench.py "$@" >"$log" 2>&1
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

# headline A/B: {fused+unrolled, fused only, XLA-only} x {1024, 4096, 16384}
for B in 4096 1024 16384; do
  run "indep_unroll_B$B"  ""                                        --batch "$B"
  run "indep_fusedonly_B$B" "BN254_DISABLE_UNROLL=1"                --batch "$B"
  run "indep_xlaonly_B$B" "BN254_DISABLE_UNROLL=1 BN254_DISABLE_FUSED=1" --batch "$B"
done

# BASELINE metric 2
run "fp12" "" --mode fp12

# configs 4/5 machinery on the real chip (axis size 1)
run "fused_B8192" "" --mode fused
run "sharded_B8192" "" --mode sharded

echo "suite done $(date -u +%H:%M:%S)" >&2
