#!/bin/bash
# Stage-1 config sweep on the real TPU: ladder level x tile budget x
# Mp-coalescing granularity.  One bench process at a time (single chip).
cd /root/repo
for cfg in \
    "512  524288  32" \
    "1024 1048576 32" \
    "1024 2097152 128" \
    "2048 2097152 128" \
    "2048 1048576 32" \
    ; do
  set -- $cfg
  echo "=== L0=$1 budget=$2 coalesce=$3 ==="
  PYHMMER_TPU_L0=$1 PYHMMER_TPU_TILE_BUDGET=$2 PYHMMER_TPU_COALESCE=$3 \
    BENCH_RUNS=2 timeout 1500 python bench.py 2>&1 | tail -2
done
