#!/bin/bash
# Final follower: after the extras A/B finishes, warm the persistent
# compile cache for the DEFAULT bench.py configuration (the exact
# invocation the driver runs at end-of-round), so its run compiles from
# cache in seconds instead of ~20 minutes cold.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "^extras done" /tmp/r3_extras.log 2>/dev/null; do
  sleep 30
done

echo "=== warmup default headline $(date -u +%H:%M:%S)" >&2
timeout 3000 python bench.py > /tmp/bench_warmup_default.log 2>&1
echo "warmup rc=$? $(date -u +%H:%M:%S)" >&2
tail -2 /tmp/bench_warmup_default.log >&2
echo "warmup done $(date -u +%H:%M:%S)" >&2
