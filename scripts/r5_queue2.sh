#!/bin/bash
# Round-5 second wave (runs after r5_queue.sh drains the chip).
# Fills in the remaining measurement gaps:
#   - bs=64 point for the batch-scaling curve (PERF_NOTES r5 table)
#   - int8 PTQ accuracy on a NON-saturated (hard-fixture) anchor — the r3
#     int8 parity evidence was measured on a 0.98-mIoU anchor where a small
#     regression would be invisible
#   - hard-fixture anchor for BASELINE config #1 (B0 binary) so every
#     north-star config has a regression-sensitive anchor
cd /root/repo || exit 1
mkdir -p logs/r5

run() {
  local name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) :: $*" >> logs/r5/queue.log
  timeout 7200 "$@" > "logs/r5/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)" >> logs/r5/queue.log
}

run bench_bs64 env BENCH_BATCH=64 BENCH_SECONDARY_BATCH=0 python bench.py

run hard_b5_int8 python scripts/train_convergence.py \
  --model efficientnet-unet-b5 --label-map osm-multiclass --segments 128 \
  --bs 32 --lr 3e-4 --epochs 40 --difficulty 0.7 --int8-eval

run hard_b0_binary python scripts/train_convergence.py \
  --model efficientnet-unet-b0 --label-map osm-impervious-binary \
  --segments 128 --bs 32 --lr 1e-3 --epochs 40 --difficulty 0.7

echo "=== QUEUE2 DONE $(date -u +%H:%M:%S)" >> logs/r5/queue.log
