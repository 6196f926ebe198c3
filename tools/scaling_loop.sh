#!/bin/bash
# Retry the two-level scaling benchmark periodically to catch a quiet
# window on the noisy shared host; BENCH/BASELINE.md keeps best-observed.
cd /root/repo
for i in $(seq 1 "${1:-6}"); do
  echo "=== scaling attempt $i $(date)"
  timeout 1500 env SPARK_GRAFT_SCALE_ROUNDS=1 python bench.py --scaling 2>/dev/null | tail -1
  sleep "${2:-400}"
done
