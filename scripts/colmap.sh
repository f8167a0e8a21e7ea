#!/bin/bash
# Offline COLMAP training (reference scripts/colmap.sh: tandt_db scenes).
set -e
DATA=${1:?colmap_root}
OUT=${2:?output_root}
for scene in "$DATA"/*/; do
  name=$(basename "$scene")
  echo "=== $name ==="
  python -m photo_slam_tpu.apps.train_colmap --data "$scene" --out "$OUT/$name"
done
