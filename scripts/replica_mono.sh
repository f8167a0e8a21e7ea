#!/bin/bash
# Replica monocular benchmark: every sequence x5 runs (the reference
# protocol, reference scripts/replica_mono.sh + README.md:163-174).
set -e
DATA=${1:?replica_root}
OUT=${2:?output_root}
CFG=${3:-}
for seq in room0 room1 room2 office0 office1 office2 office3 office4; do
  for run in 0 1 2 3 4; do
    echo "=== $seq run $run ==="
    python -m photo_slam_tpu.apps.online_slam replica_mono \
      --data "$DATA/$seq" --out "$OUT/$seq/$run" ${CFG:+--cfg "$CFG"}
  done
done
