#!/bin/bash
# Run every benchmark family (the reference scripts/all.sh). Dataset roots
# come from env vars; families with an unset root are skipped with a note.
set -e
cd "$(dirname "$0")"
OUT=${OUT:-../results}
run() { # family root
  if [ -n "$2" ]; then "./$1.sh" "$2" "$OUT/$1"; else
    echo "[all.sh] skip $1 (env ${3} unset)"; fi
}
run replica_mono  "$REPLICA_ROOT" REPLICA_ROOT
run replica_rgbd  "$REPLICA_ROOT" REPLICA_ROOT
run tum_mono      "$TUM_ROOT"     TUM_ROOT
run tum_rgbd      "$TUM_ROOT"     TUM_ROOT
run euroc_stereo  "$EUROC_ROOT"   EUROC_ROOT
