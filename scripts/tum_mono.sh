#!/bin/bash
# TUM monocular benchmark: 3 sequences x5 runs (reference scripts/tum_mono.sh;
# fr3_long_office is a BASELINE.json headline config).
set -e
DATA=${1:?tum_root}
OUT=${2:?output_root}
CFG=${3:-}
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz rgbd_dataset_freiburg3_long_office_household; do
  for run in 0 1 2 3 4; do
    echo "=== $seq run $run ==="
    python -m photo_slam_tpu.apps.online_slam tum_mono \
      --data "$DATA/$seq" --out "$OUT/$seq/$run" ${CFG:+--cfg "$CFG"}
  done
done
