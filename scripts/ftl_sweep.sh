#!/bin/bash
# Fused-transformer bottleneck sweep at the seq_scale shape (VERDICT r3 #3).
# Each run is one subprocess under timeout so a hung compile can't block
# the rest. Usage: bash scripts/ftl_sweep.sh [extra ftl_bench args...]
set -u
cd "$(dirname "$0")/.."
L=${L:-200}; B=${B:-1024}; D=${D:-128}

run() { # run <tag> <dropout> [ENV=V ...]
  local tag=$1 drop=$2; shift 2
  echo "=== $tag ==="
  timeout 900 env "$@" python scripts/ftl_bench.py --B "$B" --L "$L" \
    --D "$D" --steps 20 --dropout "$drop" ${EXTRA[@]+"${EXTRA[@]}"} \
    2>/dev/null | tail -1
}
EXTRA=("$@")
run baseline    0.5 _=1
run no-dropout  0.0 _=1
run xla-path    0.5 RECSTUDIO_NO_FUSED_TL=1
run tiles-2,1   0.5 RECSTUDIO_FTL_TILES=2,1
run tiles-8,1   0.5 RECSTUDIO_FTL_TILES=8,1
run tiles-4,2   0.5 RECSTUDIO_FTL_TILES=4,2
