#!/bin/bash
# EuRoC stereo benchmark: 4 sequences x5 runs (reference scripts/euroc_stereo.sh).
set -e
DATA=${1:?euroc_root}
OUT=${2:?output_root}
CFG=${3:-}
for seq in MH_01_easy MH_02_easy V1_01_easy V2_01_easy; do
  for run in 0 1 2 3 4; do
    echo "=== $seq run $run ==="
    python -m photo_slam_tpu.apps.online_slam euroc_stereo \
      --data "$DATA/$seq" --out "$OUT/$seq/$run" ${CFG:+--cfg "$CFG"}
  done
done
