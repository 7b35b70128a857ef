#!/bin/bash
# Post-suite TPU experiment queue: waits for run_bench_suite.sh to finish,
# then runs the fold-mul A/B, cold-compile profiles, and stage profiling.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "^suite done" /tmp/bench_suite.log 2>/dev/null; do
  sleep 60
done

echo "=== ab_fold_mul $(date -u +%H:%M:%S)"
timeout 3600 python tools/ab_fold_mul.py > /tmp/ab_fold_mul.log 2>&1
echo "rc=$?" >> /tmp/ab_fold_mul.log

echo "=== profile_cold run 1 $(date -u +%H:%M:%S)"
timeout 3600 python tools/profile_cold.py 4096 > /tmp/profile_cold_1.log 2>&1
echo "rc=$?" >> /tmp/profile_cold_1.log

echo "=== profile_cold run 2 $(date -u +%H:%M:%S)"
timeout 3600 python tools/profile_cold.py 4096 > /tmp/profile_cold_2.log 2>&1
echo "rc=$?" >> /tmp/profile_cold_2.log

echo "=== profile_stages $(date -u +%H:%M:%S)"
timeout 3600 python tools/profile_stages.py 4096 > /tmp/profile_stages_r3.log 2>&1
echo "rc=$?" >> /tmp/profile_stages_r3.log

echo "=== scaling_report $(date -u +%H:%M:%S)"
timeout 3600 python tools/scaling_report.py 4096 > /tmp/scaling_report_r3.log 2>&1
echo "rc=$?" >> /tmp/scaling_report_r3.log

echo "followups done $(date -u +%H:%M:%S)"
