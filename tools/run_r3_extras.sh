#!/bin/bash
# Waits for run_r3_remaining.sh (watches /tmp/r3_remaining.log), then
# benches the two round-3 algorithm candidates end-to-end:
#   - pair2: shared-squaring 2-pair Miller loop (BN254_PAIR2=1)
#   - fold:  MXU fold-matmul leaf multiply, XLA-only pipeline
# Appends to BENCH_SUITE.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_SUITE.jsonl}

while ! grep -q "^suite done" /tmp/r3_remaining.log 2>/dev/null; do
  sleep 30
done

# merge the suite's /tmp compile cache into the persistent repo cache
# (the suite predates the repo-local-cache switch); entries are
# content-addressed files so a no-clobber copy is safe.
mkdir -p .jax_cache
cp -rn /tmp/bn254_jax_cache/. .jax_cache/ 2>/dev/null || true

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

run "indep_pair2_B4096" "BN254_PAIR2=1" --batch 4096
run "indep_fold_B4096" "BN254_MUL_ALGO=fold BN254_DISABLE_FUSED=1 BN254_DISABLE_UNROLL=1" --batch 4096

echo "extras done $(date -u +%H:%M:%S)" >&2
