#!/bin/bash
# Round-5 serialized TPU job queue (one chip — anchors must not overlap).
# Each job logs to logs/r5/<name>.log; failures do not stop the queue.
# Ordered by VERDICT r4 priority: large-batch equal-mIoU first.
cd /root/repo || exit 1
mkdir -p logs/r5

run() {
  local name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) :: $*" >> logs/r5/queue.log
  timeout 7200 "$@" > "logs/r5/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)" >> logs/r5/queue.log
}

# VERDICT #2 (T>1 steady-state benches) already measured and landed in
# PERF_NOTES r5 (B5 T=4 407.1 img/s, fc-prithvi T=4 MFU 0.442) — skipped here.

# VERDICT #1 + #8: large-batch equal-mIoU anchor + bs=32 control, both on a
# 512-segment corpus with fused dispatch (steady-state reporting)
run largebatch_bs128 python scripts/train_convergence.py \
  --model efficientnet-unet-b5 --label-map osm-multiclass --segments 512 \
  --bs 128 --lr 3e-4 --scale-lr-ref-bs 32 --epochs 40 --steps-per-dispatch 3
run control_bs32_512 python scripts/train_convergence.py \
  --model efficientnet-unet-b5 --label-map osm-multiclass --segments 512 \
  --bs 32 --lr 3e-4 --epochs 40 --steps-per-dispatch 12

# VERDICT #3: config #3 as written — cnes-full 24-class, T=4, all 12 bands
run cnes_full_t4 python scripts/train_convergence.py \
  --model efficientnet-unet-b5 --label-map cnes-full --bands all12 \
  --time-frames 4 --stack-time --bs 16 --lr 1e-3 --epochs 48

# VERDICT #4: hard-fixture anchors (configs #2, #3)
run hard_b5_osm python scripts/train_convergence.py \
  --model efficientnet-unet-b5 --label-map osm-multiclass --segments 128 \
  --bs 32 --lr 3e-4 --epochs 40 --difficulty 0.7
run hard_cnes_full_t4 python scripts/train_convergence.py \
  --model efficientnet-unet-b5 --label-map cnes-full --bands all12 \
  --time-frames 4 --stack-time --bs 16 --lr 1e-3 --epochs 48 --difficulty 0.7

# VERDICT #6: the tune campaign (hard fixture, 16 ASHA trials + 2 converged)
run tune_campaign python scripts/tune_campaign.py --n-trials 16

# VERDICT #7: T=3 MAE pretrain->finetune (published Prithvi tubelet geometry)
run t3_mae_pipeline python scripts/pretrain_finetune_anchor.py \
  --time-frames 3 --mae-epochs 40 --seg-epochs 40

# VERDICT #4: hard config #4 (pretrain -> frozen -> unfrozen two-phase)
run hard_pf_pipeline python scripts/pretrain_finetune_anchor.py \
  --difficulty 0.7 --mae-epochs 40 --seg-epochs 40

echo "=== QUEUE DONE $(date -u +%H:%M:%S)" >> logs/r5/queue.log
