#!/bin/bash
# THE benchmark suite runner (the only one — VERDICT r3 asked for the six
# overlapping r3 scripts to be collapsed into one parameterized runner).
#
# Config matrix as data: each row is  tag|env vars|bench.py args.
# Every recorded line is stamped with the git commit + UTC time so stale
# lines are distinguishable from current ones (VERDICT r3 minor).
#
# Usage: tools/run_bench_suite.sh [tag ...]     # default: all rows
#        OUT=file.jsonl tools/run_bench_suite.sh headline
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-BENCH_SUITE.jsonl}
COMMIT=$(git rev-parse --short HEAD 2>/dev/null || echo unknown)

# tag|env|args
MATRIX=(
  "indep_unroll_B4096||--mode independent --batch 4096"
  "indep_pair2_B4096|BN254_PAIR2=1|--mode independent --batch 4096"
  "indep_pair2_B16384|BN254_PAIR2=1|--mode independent --batch 16384"
  "fused_glv_B8192||--mode fused"
  "adaptive_B8192||--mode adaptive --batch 8192"
  "fused_plain_B8192|BN254_DISABLE_GLV=1|--mode fused"
  "sharded_glv_B8192||--mode sharded"
  "fp12||--mode fp12"
  "fused_chunked_B1M||--mode fused --batch 1048576 --chunks 128"
  "sharded_chunked_B65536||--mode sharded --batch 65536 --sharded-chunk 8192"
  "indep_xlaonly_B4096|BN254_DISABLE_FUSED=1 BN254_DISABLE_UNROLL=1|--mode independent --batch 4096"
  "indep_fusedonly_B4096|BN254_DISABLE_UNROLL=1|--mode independent --batch 4096"
)

run() {
  local tag="$1" env_vars="$2" bench_args="$3"
  echo "=== $tag (env: ${env_vars:-none}) $(date -u +%H:%M:%S)" >&2
  local log="/tmp/bench_${tag}.log"
  local t0=$SECONDS
  env $env_vars timeout "${BENCH_TIMEOUT:-5400}" python bench.py $bench_args >"$log" 2>&1
  local rc=$?
  local wall=$((SECONDS - t0))
  local json
  json=$(grep -h '^{' "$log" | tail -1)
  if [ $rc -eq 0 ] && [ -n "$json" ]; then
    echo "$json" | python -c "
import json, sys
d = json.loads(sys.stdin.read())
assert 'metric' in d and 'value' in d, 'not a benchmark line'
d['config'] = '$tag'
d['wall_s'] = $wall
d['commit'] = '$COMMIT'
d['utc'] = '$(date -u +%Y-%m-%dT%H:%M:%S)'
print(json.dumps(d))" >> "$OUT" 2>/dev/null \
      || echo "{\"config\": \"$tag\", \"rc\": $rc, \"wall_s\": $wall, \"commit\": \"$COMMIT\", \"error\": \"bad json line, see $log\"}" >> "$OUT"
  elif [ $rc -eq 124 ]; then
    echo "{\"config\": \"$tag\", \"rc\": 124, \"timeout\": true, \"wall_s\": $wall, \"commit\": \"$COMMIT\", \"error\": \"see $log\"}" >> "$OUT"
  else
    echo "{\"config\": \"$tag\", \"rc\": $rc, \"wall_s\": $wall, \"commit\": \"$COMMIT\", \"error\": \"see $log\"}" >> "$OUT"
  fi
  tail -3 "$log" >&2
}

want() {
  local tag="$1"; shift
  [ $# -eq 0 ] && return 0  # no selectors: run every row
  for w in "$@"; do [ "$w" = "$tag" ] && return 0; done
  return 1
}

SELECT=("$@")
for row in "${MATRIX[@]}"; do
  IFS='|' read -r tag env_vars bench_args <<< "$row"
  # ${SELECT[@]+...} expands to NOTHING when the array is empty (a bare
  # "${SELECT[@]:-}" would pass one empty word, matching no tag ever)
  if want "$tag" ${SELECT[@]+"${SELECT[@]}"}; then
    run "$tag" "$env_vars" "$bench_args"
  fi
done

echo "suite done $(date -u +%H:%M:%S)" >&2
